"""Probe: sublane-axis dynamic gather inside a Pallas TPU kernel.

The dg stage kernels' cross-block exchange is a per-lane 16-way select
implemented as a mux tree — ~15 vselects + masks per output block, ~80%
of each 2.5 ms stage pass (docs/STEP_ACCOUNTING.json vs the 0.31 ms HBM
floor). If Mosaic lowers ``jnp.take_along_axis(x, idx, axis=-2)`` (gather
along the SUBLANE dim with per-lane indices) to a native tpu.dynamic_gather,
the exchange becomes ONE op: view each grid row [C] as [B, W] (a free
row-major reshape), gather across the B sublanes.

Stages probed:
  1. correctness+compile of take_along_axis along axis -2 at [16, 128]
     and [g*16, 128] f32 / u32 shapes;
  2. timing of a full stage pass built on it vs the mux-tree kernel.
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


def _kernel_sg(x_ref, i_ref, o_ref):
    # x [S, L]; i [S, L] int32; out[s, l] = x[i[s, l], l]
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)


def _kernel_sg3(x_ref, i_ref, o_ref):
    # x [G, S, L]; gather along axis 1 (sublane dim of the tiled pair)
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)


def try_case(name, shape, dtype, axis):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    if dtype == jnp.uint32:
        x = (x * 1e4).astype(np.uint32)
    else:
        x = x.astype(dtype)
    s = shape[axis]
    idx = rng.integers(0, s, size=shape).astype(np.int32)
    kern = _kernel_sg if len(shape) == 2 else _kernel_sg3
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(jnp.asarray(x), jnp.asarray(idx))
        ref = np.take_along_axis(np.asarray(x), idx, axis=axis)
        got = np.asarray(jax.device_get(out))
        ok = bool((got == ref).all())
        return {"case": name, "compiled": True, "exact": ok}
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        return {"case": name, "compiled": False, "err": msg}


def main():
    results = []
    for name, shape, dtype, axis in [
        ("f32_16x128_ax0", (16, 128), jnp.float32, 0),
        ("f32_256x128_ax0", (256, 128), jnp.float32, 0),
        ("u32_16x128_ax0", (16, 128), jnp.uint32, 0),
        ("f32_g8_16x128_ax1", (8, 16, 128), jnp.float32, 1),
        ("f32_g64_16x128_ax1", (64, 16, 128), jnp.float32, 1),
        ("bf16_16x128_ax0", (16, 128), jnp.bfloat16, 0),
    ]:
        r = try_case(name, shape, dtype, axis)
        results.append(r)
        print(json.dumps(r), flush=True)
    with open("docs/SUBLANE_GATHER_PROBE.json", "w") as f:
        json.dump({"results": results}, f, indent=1)


if __name__ == "__main__":
    main()
