"""Probe: Mosaic ``tpu.dynamic_gather`` (jnp.take_along_axis in-kernel).

jax 0.9 lowers 2D same-shape take_along_axis inside Pallas TPU kernels to
tpu.dynamic_gather on the lane (axis=1) or sublane (axis=0) axis. If this
is fast, it replaces the one-hot MXU matmuls in the permute/gather stage
kernels (contraction over C per 128 outputs) with VPU shuffles.

Checks, on the real chip (single process, natural completion):
  1. correctness: lane-gather of [32, 1024] f32 against XLA take
  2. dtype surface: f32, bf16, int32
  3. amortized timing: dynamic-gather row-local permute vs the one-hot
     kernel on the bench-size grid [32, 2048, 1024]
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

ROWS = 8


def _dg_kernel(x_ref, p_ref, o_ref):
    d, rows, c = x_ref.shape
    for r in range(rows):
        x = x_ref[:, r, :]
        idx = jnp.broadcast_to(p_ref[r, :][None, :], (d, c))
        o_ref[:, r, :] = jnp.take_along_axis(x, idx, axis=1,
                                             mode="promise_in_bounds")


@functools.partial(jax.jit, static_argnames=("interpret",))
def dg_local_permute(x, p, interpret=False):
    d, r, c = x.shape
    rows = min(16 if x.dtype == jnp.bfloat16 else ROWS, r)
    return pl.pallas_call(
        _dg_kernel,
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        interpret=interpret,
    )(x, p)


def timed(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out[:, :1, :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[:, :1, :1].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3


def main():
    results = {"backend": jax.default_backend()}
    rng = np.random.default_rng(0)

    # --- 1. correctness, one block ---
    d, c = 32, 1024
    x = jnp.asarray(rng.standard_normal((d, 8, c)).astype(np.float32))
    p = jnp.asarray(np.stack([rng.permutation(c) for _ in range(8)])
                    .astype(np.int32))
    try:
        got = dg_local_permute(x, p)
        want = jnp.take_along_axis(
            x, jnp.broadcast_to(p[None], x.shape), axis=2)
        ok = bool(jnp.array_equal(got, want))
        results["correct_f32"] = ok
    except Exception as e:  # noqa: BLE001
        results["correct_f32"] = f"FAIL: {type(e).__name__}: {e}"[:300]

    for name, dt in [("bf16", jnp.bfloat16), ("int32", jnp.int32)]:
        try:
            xx = (jnp.asarray(rng.integers(0, 100, (d, 8, c))).astype(dt)
                  if dt == jnp.int32 else x.astype(dt))
            got = dg_local_permute(xx, p)
            want = jnp.take_along_axis(
                xx, jnp.broadcast_to(p[None], xx.shape), axis=2)
            results[f"correct_{name}"] = bool(jnp.array_equal(got, want))
        except Exception as e:  # noqa: BLE001
            results[f"correct_{name}"] = f"FAIL: {type(e).__name__}: {e}"[:300]

    print(json.dumps(results), flush=True)

    # --- 2. timing on the bench grid ---
    R, C = 2048, 1024
    pg = jnp.asarray(
        np.stack([rng.permutation(C) for _ in range(R)]).astype(np.int32))
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        xg = jnp.asarray(rng.standard_normal((d, R, C)).astype(np.float32)
                         ).astype(dt)
        try:
            ms = timed(dg_local_permute, xg, pg)
            gbps = 2 * xg.size * xg.dtype.itemsize / (ms / 1e3) / 1e9
            results[f"dg_rlp_{name}_ms"] = round(ms, 3)
            results[f"dg_rlp_{name}_gbps"] = round(gbps, 1)
        except Exception as e:  # noqa: BLE001
            results[f"dg_rlp_{name}_ms"] = f"FAIL: {type(e).__name__}: {e}"[:300]
        print(json.dumps(results), flush=True)

        # one-hot kernel baseline
        from ihgnn_tpu.ops.pallas.permute import row_local_permute
        ms = timed(row_local_permute, xg, pg)
        results[f"onehot_rlp_{name}_ms"] = round(ms, 3)
        print(json.dumps(results), flush=True)

    with open("/root/repo/docs/DYNGATHER_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
