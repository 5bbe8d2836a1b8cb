"""Probe: int8 byte-plane kernels at BENCH (short-row) shapes.

The flat int8 byte-plane kernel won at stress-scale row lengths (~10k
lanes; docs/LONGROW_PROBE.json). This probe measures the int8 variants of
the two kernels that dominate the 2M-edge bench step — the HIER row-local
permute (2x128-deep one-hot levels) and the windowed expand (depth-w
one-hot) — against the production bf16/f32 kernels, on the REAL kernel
pack stage tables of the bench graph. Integration is gated on these
numbers (CLAUDE.md: measure standalone first).

Run on the real TPU, single process, natural completion.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 30


def amortized(make_step, x0, iters=ITERS, aux=()):
    @jax.jit
    def loop(x, *aux):
        def body(c, _):
            c2, s = make_step(c, *aux)
            return c2, s
        c, s = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(s[-1])

    out = loop(x0, *aux)
    _ = float(out)           # compile + warm
    t0 = time.time()
    _ = float(loop(x0, *aux))
    return (time.time() - t0) / iters * 1e3


def main():
    from bench import build_bench_graph
    from ihgnn_tpu.ops.pallas.gather import windowed_gather, windowed_gather_t
    from ihgnn_tpu.ops.pallas.permute import (hier_int8_ok,
                                              row_local_permute_hier,
                                              row_local_permute_hier_int8)

    E, D = 2_000_000, 32
    U, Q, I = 200_000, 100_000, 400_000
    print("# building graph...", flush=True)
    graph, _ = build_bench_graph(U, Q, I, E)
    kp = graph.kp
    R, C = kp.rows, kp.cols
    rng = np.random.default_rng(0)
    results = {"config": f"E={E} R={R} C={C} d={D}"}

    def report(name, ms):
        results[name] = round(ms, 3)
        print(name, results[name], flush=True)

    h_rc = kp.i.fwd_p2  # q.fwd_p2 is None under the sigma pack        # [R, C] orientation
    h_cr = kp.q.inv_p1        # [C, R] orientation
    assert h_rc.hier and h_cr.hier

    for tag, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        xg = jnp.asarray(rng.standard_normal((D, R, C)).astype(np.float32)
                         ).astype(dt)
        report(f"rlp_hier_{tag}_ms",
               amortized(lambda x: (row_local_permute_hier(x, h_rc.tab),
                                    x[0, 0, :1]), xg))
        assert hier_int8_ok(D, R, C, dt)
        report(f"rlp_hier_int8_{tag}_ms",
               amortized(lambda x: (row_local_permute_hier_int8(x, h_rc.tab),
                                    x[0, 0, :1]), xg))

        # transposed orientation (the p1 stage): rows of length R
        xt = jnp.asarray(rng.standard_normal((D, C, R)).astype(np.float32)
                         ).astype(dt)
        report(f"rlp_hier_T_{tag}_ms",
               amortized(lambda x: (row_local_permute_hier(x, h_cr.tab),
                                    x[0, 0, :1]), xt))
        assert hier_int8_ok(D, C, R, dt)
        report(f"rlp_hier_T_int8_{tag}_ms",
               amortized(lambda x: (row_local_permute_hier_int8(x, h_cr.tab),
                                    x[0, 0, :1]), xt))

        # windowed expand, q role (the wide-window case)
        rp = kp.q.gather
        src = jnp.asarray(rng.standard_normal((D, rp.src_pad))
                          .astype(np.float32)).astype(dt)

        def ex(x, int8=False):
            out = windowed_gather(x, rp.idx, rp.win, rp.w, int8=int8)
            s = out[0, :1]
            return x * (1 + 0 * s[0]).astype(x.dtype), s

        report(f"expand_q_{tag}_ms_w{rp.w}", amortized(ex, src))
        report(f"expand_q_int8_{tag}_ms",
               amortized(lambda x: ex(x, int8=True), src))

        # fused transposed expand
        if rp.idx.shape[0] == R and rp.idx.shape[1] * 128 == C:
            def ex_t(x, int8=False):
                out = windowed_gather_t(x, rp.idx, rp.win, rp.w, int8=int8)
                s = out[0, 0, :1]
                return x * (1 + 0 * s[0]).astype(x.dtype), s

            report(f"expand_t_{tag}_ms", amortized(ex_t, src))
            report(f"expand_t_int8_{tag}_ms",
                   amortized(lambda x: ex_t(x, int8=True), src))

    print(json.dumps(results))
    with open("docs/INT8_SHORT_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
