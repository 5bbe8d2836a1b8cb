"""Weight initializers matching the reference's torch init statistics.

* ``xavier_uniform``      — torch.nn.init.xavier_uniform_ (embedding tables,
                            Models/EmbeddingLayers.py:93-104; GAT score head
                            with leaky_relu gain, Models/GnnLayers.py:66-70).
* ``torch_linear_kernel`` / ``torch_linear_bias`` — torch's default
  ``nn.Linear`` init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for
  the kernel, U(±1/sqrt(fan_in)) for the bias.

flax Dense kernels are [in, out] (torch weights are [out, in]); fan_in/out
are mapped accordingly so the sampled distributions match.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(gain: float = 1.0):
    """U(±gain*sqrt(6/(fan_in+fan_out))). For a [rows, cols] embedding table
    torch uses fan_in=cols, fan_out=rows — the bound is symmetric in them."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_kernel():
    """torch default Linear weight init: U(±1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2]  # flax kernel is [in, out]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


LEAKY_RELU_GAIN = math.sqrt(2.0 / (1.0 + 0.01 ** 2))  # torch calculate_gain('leaky_relu')
