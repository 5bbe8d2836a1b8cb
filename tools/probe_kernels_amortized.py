"""Amortized per-kernel timing of the hot-pipeline Pallas kernels.

Each kernel is timed inside a single jitted ``lax.scan`` (one dispatch,
one scalar fetch for the whole loop), so the ~2.5 ms per-dispatch axon
transport overhead (HW_PROBE.json) cannot inflate per-iteration numbers —
unlike tools/kernel_check.py's per-call timings.

Chaining: kernels whose output shape differs from the input are chained
through a scalar perturbation x*(1+0*s) with s a tiny slice-sum of the
output, which forces sequential execution without adding a full pass.

Run on the real TPU, single process, natural completion (CLAUDE.md).
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
    """make_step: (carry, *aux) -> (carry, token). Returns ms/iter.
    ``aux`` operands enter as jit ARGUMENTS — large arrays closed over
    would bake into the HLO and overflow the remote-compile payload."""
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
    from ihgnn_tpu.models.interaction import FeatureInteractor
    from ihgnn_tpu.ops.pallas.gather import windowed_gather, windowed_gather_t
    from ihgnn_tpu.ops.pallas.permute import (block_transpose,
                                              row_local_permute,
                                              row_local_permute_bfly,
                                              row_local_permute_hier,
                                              transposed_local_permute,
                                              transposed_local_permute_hier)
    from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t

    E, D = 2_000_000, 32
    U, Q, I = 200_000, 100_000, 400_000
    print("# building graph...", flush=True)
    graph, _ = build_bench_graph(U, Q, I, E)
    kp = graph.kp
    R, C = kp.rows, kp.cols
    rng = np.random.default_rng(0)

    results = {"config": f"E={E} R={R} C={C} d={D}"}

    def report(name, ms, nbytes=None):
        results[name] = round(ms, 3)
        if nbytes:
            results[name + "_gbps"] = round(nbytes / (ms / 1e3) / 1e9, 1)
        print(name, results[name], results.get(name + "_gbps", ""),
              flush=True)

    for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        isz = jnp.dtype(dt).itemsize
        xg = jnp.asarray(rng.standard_normal((D, R, C)).astype(np.float32)
                         ).astype(dt)
        pg = jnp.asarray(np.stack([rng.permutation(C) for _ in range(R)])
                         .astype(np.int32))
        nb = 2 * D * R * C * isz

        report(f"rlp_{tag}_ms",
               amortized(lambda x: (row_local_permute(x, pg),
                                    x[0, 0, :1]), xg), nb)

        def bt2(x):
            return block_transpose(block_transpose(x)), x[0, 0, :1]
        report(f"bt_{tag}_ms", amortized(bt2, xg) / 2, nb)

        pgT = jnp.asarray(np.stack([rng.permutation(R) for _ in range(C)])
                          .astype(np.int32))

        def rlpbt_pair(x):
            y = block_transpose(row_local_permute(x, pg))     # [d, C, R]
            z = block_transpose(row_local_permute(y, pgT))    # [d, R, C]
            return z, x[0, 0, :1]
        report(f"rlp_bt_pair_{tag}_ms", amortized(rlpbt_pair, xg) / 2, 2 * nb)


        # hierarchical variants, on the REAL kp stage tables (kp.q):
        # fwd_p2 is the [R, C] orientation, bwd_p1 the [C, R] one
        h_rc = kp.i.fwd_p2  # q.fwd_p2 is None under the sigma pack
        h_cr = kp.q.inv_p1
        if h_rc.hier and h_cr.hier:
            report(f"rlp_hier_{tag}_ms",
                   amortized(lambda x: (row_local_permute_hier(x, h_rc.tab),
                                        x[0, 0, :1]), xg), nb)

            def hier_pair(x):
                y = block_transpose(row_local_permute_hier(x, h_rc.tab))
                z = block_transpose(row_local_permute_hier(y, h_cr.tab))
                return z, x[0, 0, :1]
            report(f"rlp_bt_pair_hier_{tag}_ms",
                   amortized(hier_pair, xg) / 2, 2 * nb)


        # butterfly (VPU roll+select) in-row permute — same random
        # permutations as the flat/hier comparisons above. f32 only:
        # pltpu.roll cannot rotate 16-bit data (Mosaic "Rotate with
        # non-32-bit data" — measured 2026-08-18)
        run_bfly = False   # documented dead end (docs/KERNELS.md)
        print("# routing bfly words...", flush=True)
        if run_bfly:
            import time as _t
            _t0 = _t.time()

            def _bfly_words(perms):
                from ihgnn_tpu.ops import native
                from ihgnn_tpu.ops.bfly import route_rows_bfly
                w = getattr(native, "route_rows_bfly", lambda p: None)(perms)
                if w is None:
                    w = route_rows_bfly(perms)
                return jnp.asarray(w)

            cache = globals().setdefault("_bfly_cache", {})
            if "bw" not in cache:
                cache["bw"] = _bfly_words(np.asarray(pg))
                cache["bwT"] = _bfly_words(np.asarray(pgT))
            bw, bwT = cache["bw"], cache["bwT"]
            print(f"# bfly routing {_t.time() - _t0:.1f}s", flush=True)
            report(f"rlp_bfly_{tag}_ms",
                   amortized(lambda x: (row_local_permute_bfly(x, bw),
                                        x[0, 0, :1]), xg), nb)

            def bfly_bt_pair(x):
                y = block_transpose(row_local_permute_bfly(x, bw))
                z = block_transpose(row_local_permute_bfly(y, bwT))
                return z, x[0, 0, :1]
            report(f"rlp_bt_pair_bfly_{tag}_ms", amortized(bfly_bt_pair, xg) / 2,
                   2 * nb)

        # windowed expand (u role: identity-ish window; q role: wider)
        for role, rp in [("u", kp.u_expand), ("q", kp.q.gather)]:
            src = jnp.asarray(
                rng.standard_normal((D, rp.src_pad)).astype(np.float32)
            ).astype(dt)
            w = rp.w

            def ex(x, rp=rp, w=w):
                out = windowed_gather(x, rp.idx, rp.win, w)
                s = out[0, :1]
                return x * (1 + 0 * s[0]), s
            nb_ex = (D * rp.src_pad + D * R * C) * isz
            report(f"expand_{role}_{tag}_ms_w{w}", amortized(ex, src), nb_ex)

        # fused expand+transpose (q role) vs expand-then-bt pair
        rp = kp.q.gather
        if rp.idx.shape[0] == R and rp.idx.shape[1] * 128 == C:
            src = jnp.asarray(
                rng.standard_normal((D, rp.src_pad)).astype(np.float32)
            ).astype(dt)

            def ex_bt(x):
                out = block_transpose(
                    windowed_gather(x, rp.idx, rp.win, rp.w
                                    ).reshape(D, R, C))
                s = out[0, 0, :1]
                return x * (1 + 0 * s[0]), s
            report(f"expand_bt_pair_{tag}_ms", amortized(ex_bt, src))

            def ex_t(x):
                out = windowed_gather_t(x, rp.idx, rp.win, rp.w)
                s = out[0, 0, :1]
                return x * (1 + 0 * s[0]), s
            report(f"expand_t_fused_{tag}_ms", amortized(ex_t, src))

        # segsum over the real incidence ids (3 regions = 3*e_pad entries)
        k_pad = kp.ids2d.size
        vals = jnp.asarray(
            rng.standard_normal((D, k_pad)).astype(np.float32)).astype(dt)

        def ss(v):
            out = csr_segment_sum_t(v, kp.ids2d, kp.tile_ptr, kp.n,
                                    out_transposed=True)
            s = out[0, :1]
            return v * (1 + 0 * s[0]).astype(v.dtype), s
        nb_ss = (D * k_pad * isz + D * kp.n * 4)
        report(f"segsum_{tag}_ms_k{k_pad}", amortized(ss, vals), nb_ss)

        # fused interaction kernel, order 3
        mod = FeatureInteractor(3, D, D)
        e_pad = kp.e_pad
        roles = tuple(jnp.asarray(
            rng.standard_normal((D, e_pad)).astype(np.float32)).astype(dt)
            for _ in range(3))
        params = mod.init(jax.random.key(0), roles, fused_ok=True)

        def it(r0, r1, r2, params):
            out = mod.apply(params, (r0, r1, r2), fused_ok=True)
            s = out[0, :1].astype(jnp.float32)
            return r0 * (1 + 0 * s[0]).astype(r0.dtype), s
        nb_it = 4 * D * e_pad * isz
        report(f"interact_{tag}_ms",
               amortized(it, roles[0], aux=(roles[1], roles[2], params)),
               nb_it)

    print(json.dumps(results, indent=1))
    with open("/root/repo/docs/KERNELS_AMORTIZED.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
