"""Shared small modules: torch-compatible Dense, MLP, Aggregation.

Mirrors Models/CommonLayers.py:7-26 (MLP = Linear-LeakyReLU-Linear,
Aggregation = Linear-LeakyReLU) with torch default Linear init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ihgnn_tpu.models.initializers import torch_linear_bias, torch_linear_kernel

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default negative_slope


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class TorchDense(nn.Module):
    """nn.Dense with torch's default Linear initialization."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel(),
            bias_init=torch_linear_bias(self.in_features),
            name="dense",
        )(x)


class _DenseParamsT(nn.Module):
    """Raw kernel/bias params (same names/shapes as nn.Dense) applied to
    feature-major input: y_t [out, *] = kernelᵀ · x_t [in, *] + bias."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self, x_t: jnp.ndarray) -> jnp.ndarray:
        import jax

        kernel = self.param("kernel", torch_linear_kernel(),
                            (self.in_features, self.features))
        bias = self.param("bias", torch_linear_bias(self.in_features),
                          (self.features,))
        y = jax.lax.dot_general(kernel, x_t, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + bias[:, None]


class TorchDenseT(nn.Module):
    """Feature-major TorchDense: [in, N] → [out, N]. The param tree is
    identical to TorchDense ("dense"/kernel+bias), so layouts are a compile
    choice, not a checkpoint format."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self, x_t: jnp.ndarray) -> jnp.ndarray:
        return _DenseParamsT(self.features, self.in_features,
                             name="dense")(x_t)


class MLP(nn.Module):
    """Linear(in,in) → LeakyReLU → Linear(in,out) (CommonLayers.py:7-16)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = TorchDense(self.in_features, self.in_features, name="fc1")(x)
        x = leaky_relu(x)
        return TorchDense(self.out_features, self.in_features, name="fc2")(x)


class Aggregation(nn.Module):
    """Linear(in,out) → LeakyReLU (CommonLayers.py:18-26)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return leaky_relu(TorchDense(self.out_features, self.in_features, name="fc")(x))
