"""Probe: MXU-based in-kernel block transpose vs the VPU swapaxes.

The stage-pass accounting (docs/STEP_ACCOUNTING.json) shows every
mid-stage kernel sitting 8-16x over its HBM floor, and the cols=2048
experiment proved the dg mux tree is NOT the driver (sig_inverse rows
were flat when b halved). The other big VPU cost in these kernels is the
in-VMEM transpose: the bt canary runs 2.43 ms against a 0.31 ms floor —
~2.1 ms of pure vreg-transpose work per full-array pass, and the fused
tlp kernels contain one or two of them.

A transpose IS expressible on the MXU: dot_general(xs, I, contracting
dim 0 of BOTH operands) = xsᵀ·I = xsᵀ. For bf16 data the one-hot
contraction sums exactly one term per output — bit-exact — and the MXU
sits idle in these kernels, so Mosaic can overlap it with VPU work.

Variants timed at [32, 2048, 1024] bf16 (the bench mid-stage shape):
  bt_vpu     the production block_transpose (swapaxes)
  bt_mxu     per-d dot_general against a 128x128 identity
  bt_mxu_m   d-batched: one [d*T, T] dot per (i,j) tile pair — the d
             slices stack on the non-contracted side so a single matmul
             emits all d transposed tiles
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


T = 128


def _kernel_vpu(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)


def _kernel_mxu(x_ref, o_ref):
    d = x_ref.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
           ).astype(jnp.bfloat16)
    for dd in range(d):
        xs = x_ref[dd]                    # [T, T]
        o_ref[dd] = jax.lax.dot_general(
            xs.astype(jnp.bfloat16), eye,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_mxu_m(x_ref, o_ref):
    d = x_ref.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
           ).astype(jnp.bfloat16)
    # [d, T, T] -> [T, d*T]: per contraction index k the d tiles'
    # row k concatenate on the N side; out = xsᵀ·I per tile
    xs = jnp.swapaxes(x_ref[...], 0, 1).reshape(T, d * T)
    y = jax.lax.dot_general(
        eye, xs.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # [T, d*T] = xᵀ tiles
    o_ref[...] = jnp.swapaxes(y.reshape(T, d, T), 0, 1).astype(o_ref.dtype)


def make_bt(kernel, d, r, c, dtype):
    return pl.pallas_call(
        kernel,
        grid=(c // T, r // T),
        in_specs=[pl.BlockSpec((d, T, T), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, T, T), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), dtype),
    )


def timed(fn, x, iters=20):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(x * (1.0 + 0.0 * c))
            return jnp.float32(y[0, 0, 0].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c
    _ = float(loop(x))
    t0 = time.time()
    _ = float(loop(x))
    return (time.time() - t0) / iters * 1e3


def main():
    d, r, c = 32, 2048, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((d, r, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = jnp.swapaxes(x, 1, 2)
    out = {}
    for name, kern in [("bt_vpu", _kernel_vpu), ("bt_mxu", _kernel_mxu),
                       ("bt_mxu_m", _kernel_mxu_m)]:
        try:
            f = make_bt(kern, d, r, c, x.dtype)
            y = f(x)
            exact = bool(jnp.all(y == ref))
            ms = timed(f, x)
            out[name] = {"ms": round(ms, 3), "exact": exact}
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": str(e).split("\n")[0][:160]}
        print(name, out[name], flush=True)
    with open("docs/BT_MXU_PROBE.json", "w") as f:
        json.dump({"shape": [d, r, c], "dtype": "bf16", **out}, f, indent=1)


if __name__ == "__main__":
    main()
