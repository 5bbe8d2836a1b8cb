"""Probe: dual-stream sig-inverse variants (round 5).

The scatter/gather-backward sides each run the q and i σ-inverses as a
PAIR (hyperagg._sig_inverse x2). Variants measured on the real 2M bench
pack tables, bf16:

  pair_pre       2x transposed_local_permute_dg_pre  (round-4 production)
  single_bt_rlp  bt + bt + rlp_dg + rlp_dg           (transposed output)
  dual_bt_rlp    block_transpose2 + row_local_permute_dg2 (transposed out)

The transposed-output variants only pay off if the segment-sum consumes
the [d, C, R] layout directly (slab-transposed region reads, segsum.py
round 5); this probe prices the permute side of that trade.

Writes docs/DUAL_SIG_PROBE.json. Run alone on the TPU.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def amortized(fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def body(c, _):
            return fn(*a, 1.0 + 0.0 * c), None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c
    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / iters * 1e3


def main():
    from bench import build_bench_graph
    from ihgnn_tpu.ops.pallas.permute import (block_transpose,
                                              block_transpose2,
                                              row_local_permute_dg,
                                              row_local_permute_dg2,
                                              transposed_local_permute_dg_pre)

    print("# loading 2M bench pack...", flush=True)
    graph, _ = build_bench_graph(200_000, 100_000, 400_000, 2_000_000)
    kp = graph.kp
    D, R, C = 32, kp.rows, kp.cols
    tq = jnp.asarray(kp.q.inv_p1.tab)           # [C, R]
    ti = jnp.asarray(kp.i.inv_p1.tab)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal((D, R, C))
                     .astype(np.float32)).astype(jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((D, R, C))
                     .astype(np.float32)).astype(jnp.bfloat16)

    res = {"config": f"R={R} C={C} d={D} bf16"}

    def rec(name, ms):
        res[name] = round(ms, 3)
        print(f"{name:16s} {ms:8.3f} ms", flush=True)

    # numeric check: rlp_dg2(bt2(x)) == bt(pre(x))
    ya, yb = block_transpose2(xa, xb)
    za, zb = row_local_permute_dg2(ya, yb, tq, ti)
    ref_a = block_transpose(transposed_local_permute_dg_pre(xa, tq))
    err = float(jnp.max(jnp.abs((za - ref_a).astype(jnp.float32))))
    print(f"# dual vs pre max_err {err}", flush=True)
    res["max_err"] = err
    assert err == 0.0, err

    # BOTH streams must depend on the scan carry or XLA hoists the second
    # chain out of the loop as loop-invariant (first probe run's trap)
    def pair_pre(a, b, tq, ti, s):
        oa = transposed_local_permute_dg_pre((a * s).astype(a.dtype), tq)
        ob = transposed_local_permute_dg_pre((b * s).astype(b.dtype), ti)
        return (jnp.sum(oa[:, 0, :8].astype(jnp.float32))
                + jnp.sum(ob[:, 0, :8].astype(jnp.float32)))

    def single_pre(a, tq, s):
        oa = transposed_local_permute_dg_pre((a * s).astype(a.dtype), tq)
        return jnp.sum(oa[:, 0, :8].astype(jnp.float32))

    def single_bt_rlp(a, b, tq, ti, s):
        oa = row_local_permute_dg(
            block_transpose((a * s).astype(a.dtype)), tq)
        ob = row_local_permute_dg(
            block_transpose((b * s).astype(b.dtype)), ti)
        return (jnp.sum(oa[:, 0, :8].astype(jnp.float32))
                + jnp.sum(ob[:, 0, :8].astype(jnp.float32)))

    def dual_bt_rlp(a, b, tq, ti, s):
        ya, yb = block_transpose2((a * s).astype(a.dtype),
                                  (b * s).astype(b.dtype))
        oa, ob = row_local_permute_dg2(ya, yb, tq, ti)
        return (jnp.sum(oa[:, 0, :8].astype(jnp.float32))
                + jnp.sum(ob[:, 0, :8].astype(jnp.float32)))

    rec("single_pre", amortized(single_pre, xa, tq))
    rec("pair_pre", amortized(pair_pre, xa, xb, tq, ti))
    rec("single_bt_rlp", amortized(single_bt_rlp, xa, xb, tq, ti))
    rec("dual_bt_rlp", amortized(dual_bt_rlp, xa, xb, tq, ti))

    print(json.dumps(res, indent=1))
    with open("/root/repo/docs/DUAL_SIG_PROBE.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
