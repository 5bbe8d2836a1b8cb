"""Probe: peak Pallas copy bandwidth at the stage-kernel shapes.

HW_PROBE.json puts XLA streaming copies at 283-395 GB/s on this chip
(spec 819), while every stage kernel sits at ~105 GB/s regardless of its
compute mix (bt == bt_mxu == dg within noise, docs/BT_MXU_PROBE.json).
This measures where the ceiling is: a no-compute Pallas copy over the
same [32, R, C] arrays at several block heights, the same with an
in-kernel swapaxes, and the XLA copy as reference.
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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def make_copy(d, r, c, rows, dtype):
    return pl.pallas_call(
        _copy_kernel,
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )


def make_copy_flat(d, e, cols, dtype):
    return pl.pallas_call(
        _copy_kernel,
        grid=(e // cols,),
        in_specs=[pl.BlockSpec((d, cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, e), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )


def timed(fn, x, iters=20):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(x + c.astype(x.dtype))
            return c + y.reshape(-1)[0].astype(jnp.float32) * 0, None
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
    nbytes = x.size * 2 * 2      # read + write
    out = {}

    for rows in (16, 32, 64, 128, 256):
        f = make_copy(d, r, c, rows, x.dtype)
        ms = timed(f, x)
        out[f"pallas_copy_rows{rows}"] = {
            "ms": round(ms, 3), "gbps": round(nbytes / ms / 1e6, 1)}
        print(f"rows{rows}", out[f"pallas_copy_rows{rows}"], flush=True)

    xf = x.reshape(d, r * c)
    for cols in (8192, 32768, 131072):
        f = make_copy_flat(d, r * c, cols, x.dtype)
        ms = timed(f, xf)
        out[f"pallas_copy_flat_{cols}"] = {
            "ms": round(ms, 3), "gbps": round(nbytes / ms / 1e6, 1)}
        print(f"flat{cols}", out[f"pallas_copy_flat_{cols}"], flush=True)

    @jax.jit
    def xla_copy(x):
        return x + x.dtype.type(0)
    ms = timed(xla_copy, x)
    out["xla_copy"] = {"ms": round(ms, 3),
                       "gbps": round(nbytes / ms / 1e6, 1)}
    print("xla", out["xla_copy"], flush=True)

    with open("docs/PALLAS_COPY_PROBE.json", "w") as f:
        json.dump({"shape": [d, r, c], "dtype": "bf16", **out}, f, indent=1)


if __name__ == "__main__":
    main()
