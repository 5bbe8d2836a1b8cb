"""On-chip kernel regression check — run on the real TPU, one process, to
natural completion (CLAUDE.md: never probe the TPU with short timeouts).

For each Pallas kernel: compile non-interpreted, compare against the XLA
reference formulation, and time it with the scalar-fetch discipline (the
axon transport's block_until_ready can return early; every timing boundary
forces a float() fetch, and iterations are chained through a scalar so XLA
cannot elide or overlap them).

Writes KERNEL_CHECK.json at the repo root:
  {"platform": ..., "results": [{"op", "ms", "ok", "max_err", ...}]}

Usage: python tools/kernel_check.py [--edges 2000000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, x, iters):
    """ms per call of jitted fn(x, s_scalar) -> (y, s'), chained via s."""
    import jax
    import jax.numpy as jnp

    s = jnp.zeros((), jnp.float32)
    y, s = fn(x, s)                     # compile + first run
    _ = float(s)
    t0 = time.time()
    for _ in range(iters):
        y, s = fn(x, s)
    _ = float(s)                        # chained scalar syncs the whole run
    return (time.time() - t0) / iters * 1e3, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=400_000)
    ap.add_argument("--emb", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CPU smoke test)")
    ap.add_argument("--out", default="KERNEL_CHECK.json")
    args = ap.parse_args()
    if args.quick:
        args.edges, args.users, args.queries, args.items = 20_000, 2_000, 1_000, 4_000
        args.iters = 2

    import jax
    import jax.numpy as jnp

    from ihgnn_tpu.graph import build_hypergraph
    from ihgnn_tpu.ops.pallas.gather import expand_pack, windowed_gather
    from ihgnn_tpu.ops.pallas.permute import (benes_permute, block_transpose,
                                              make_plan, row_local_permute)
    from ihgnn_tpu.ops.pallas.segsum import (csr_segment_sum_t,
                                             prepare_segment_inputs)

    platform = jax.default_backend()
    interp = platform != "tpu"   # pallas compiles only on TPU
    d, e = args.emb, args.edges
    n = args.users + args.queries + args.items
    results = []
    rng = np.random.default_rng(0)

    def report(op, ms, ok, max_err, **kw):
        row = {"op": op, "ms": round(ms, 3), "ok": bool(ok),
               "max_err": float(max_err), **kw}
        results.append(row)
        print(json.dumps(row))

    # ---- graph-shaped data ----
    uqif = np.stack([rng.integers(0, args.users, e),
                     rng.integers(0, args.queries, e),
                     rng.integers(0, args.items, e),
                     np.ones(e, np.int64)], axis=1)
    graph = build_hypergraph(uqif, n, args.users, args.queries)
    x_np = rng.standard_normal((d, n)).astype(np.float32) * 0.1

    # ---- 1. CSR segment-sum (scatter side), 3E entries ----
    vals_np = rng.standard_normal((3 * e,)).astype(np.float32) * 0.1
    vals_col = jnp.asarray(vals_np[:, None])
    vals_pad, ids2d, tile_ptr = prepare_segment_inputs(
        vals_col, np.asarray(graph.inc_node), n)
    k_pad = vals_pad.shape[0]
    vt = jnp.tile(jnp.asarray(vals_pad).T, (d, 1))      # [d, K_pad]
    vt = jax.device_put(vt)

    @jax.jit
    def seg_fn(v, s):
        out = csr_segment_sum_t(v + s * 0, ids2d, tile_ptr, n,
                                out_transposed=True, interpret=interp)
        return out, jnp.sum(out[:, :8])

    ms, out = timed(seg_fn, vt, args.iters)
    ref = np.zeros((n,), np.float64)
    np.add.at(ref, np.asarray(graph.inc_node), vals_np.astype(np.float64))
    err = np.abs(np.asarray(out[0]) - ref).max()
    scale = max(np.abs(ref).max(), 1.0)
    report("pallas_segsum_3E", ms, err / scale < 1e-4, err,
           entries=int(k_pad), gbps=round(k_pad * d * 4 / ms / 1e6, 1))

    # XLA baseline
    inc_node = jax.device_put(jnp.asarray(graph.inc_node))
    ev = jax.device_put(jnp.asarray(np.tile(vals_np[None, :], (d, 1))))

    @jax.jit
    def seg_xla(v, s):
        out = jax.ops.segment_sum((v + s * 0).T, inc_node, num_segments=n,
                                  indices_are_sorted=True)
        return out, jnp.sum(out[:8])

    ms_x, out_x = timed(seg_xla, ev, max(2, args.iters // 5))
    err_x = np.abs(np.asarray(out_x[:, 0]) - ref).max()
    report("xla_segsum_3E", ms_x, err_x / scale < 1e-4, err_x)

    # ---- 2. windowed gather (banded expand) of the i-role ----
    i_sorted = np.sort(graph.i3[:, 2])
    # pad the expansion so its grid rows are 128-aligned (EXP_RT) — the
    # fused transposed variant requires it (production packs always are)
    row_quant = 1024 * 128
    if i_sorted.size % row_quant:
        pad = row_quant - i_sorted.size % row_quant
        i_sorted = np.concatenate([i_sorted, np.full(pad, i_sorted[-1])])
    pack, k_exp = expand_pack(i_sorted, c=1024)
    src = np.zeros((d, pack.src_pad), np.float32)
    src[:, :n] = x_np[:, :min(n, pack.src_pad)]
    src_j = jax.device_put(jnp.asarray(src))

    @jax.jit
    def wg_fn(x, s):
        out = windowed_gather(x + s * 0, pack.idx_rel, pack.win, pack.w,
                              interpret=interp)
        return out, jnp.sum(out[:, :8])

    ms, out = timed(wg_fn, src_j, args.iters)
    ids_pad = np.concatenate([i_sorted,
                              np.full(k_exp - i_sorted.size, i_sorted[-1])])
    ref_g = src[:, ids_pad]
    err = np.abs(np.asarray(out) - ref_g).max()
    report("pallas_windowed_expand_E", ms, err < 1e-3, err,
           w=pack.w, entries=int(k_exp))

    # fused expand+transpose (production _role_forward first step)
    from ihgnn_tpu.ops.pallas.gather import EXP_RT, windowed_gather_t
    rg = pack.idx_rel.shape[0]
    cg = pack.idx_rel.shape[1] * 128
    if rg % EXP_RT == 0:
        @jax.jit
        def wgt_fn(x, s):
            out = windowed_gather_t(x + s * 0, pack.idx_rel, pack.win,
                                    pack.w, interpret=interp)
            return out, jnp.sum(out[:, :8, 0])

        ms, out = timed(wgt_fn, src_j, args.iters)
        ref_t = np.swapaxes(ref_g.reshape(d, rg, cg), 1, 2)
        err = np.abs(np.asarray(out) - ref_t).max()
        report("pallas_windowed_expand_t_E", ms, err < 1e-3, err)

    # XLA gather baselines: sorted expand + random gather
    ids_j = jax.device_put(jnp.asarray(ids_pad.astype(np.int32)))
    rand_ids = jax.device_put(jnp.asarray(
        rng.integers(0, n, e).astype(np.int32)))

    @jax.jit
    def gather_xla(x, s):
        out = (x + s * 0)[:, ids_j]
        return out, jnp.sum(out[:, :8])

    @jax.jit
    def gather_xla_rand(x, s):
        out = (x + s * 0)[:, rand_ids]
        return out, jnp.sum(out[:, :8])

    x_j = jax.device_put(jnp.asarray(x_np))
    ms_x, _ = timed(gather_xla, src_j, max(2, args.iters // 2))
    report("xla_gather_sorted_E", ms_x, True, 0.0)
    ms_x, _ = timed(gather_xla_rand, x_j, max(2, args.iters // 2))
    report("xla_gather_random_E", ms_x, True, 0.0)

    # ---- 3. Beneš permutation of [d, E] edge features ----
    # a real role bijection: q-rank -> edge id
    perm = np.argsort(np.asarray(graph.i3[:, 1]), kind="stable").astype(np.int64)
    t0 = time.time()
    plan = make_plan(perm, c=1024)
    route_s = time.time() - t0
    e_pad = plan.rows * plan.cols
    ef_np = rng.standard_normal((d, e_pad)).astype(np.float32) * 0.1
    ef = jax.device_put(jnp.asarray(ef_np))

    @jax.jit
    def benes_fn(x, s):
        out = benes_permute(x + s * 0, plan, interpret=interp)
        return out, jnp.sum(out[:, :8])

    ms, out = timed(benes_fn, ef, args.iters)
    perm_pad = np.concatenate([perm, np.arange(e, e_pad)])
    ref_p = ef_np[:, perm_pad]
    err = np.abs(np.asarray(out) - ref_p).max()
    report("pallas_benes_permute_E", ms, err < 1e-3, err,
           rows=plan.rows, cols=plan.cols, route_s=round(route_s, 2))

    # stage kernels individually
    g = ef.reshape(d, plan.rows, plan.cols)

    @jax.jit
    def stage0_fn(x, s):
        out = row_local_permute(x + s * 0, plan.p0, interpret=interp)
        return out, jnp.sum(out[:, 0, :8])

    ms, _ = timed(stage0_fn, g, args.iters)
    report("pallas_local_permute_stage", ms, True, 0.0)

    @jax.jit
    def transpose_fn(x, s):
        out = block_transpose(x + s * 0, interpret=interp)
        return out, jnp.sum(out[:, 0, :8])

    ms, _ = timed(transpose_fn, g, args.iters)
    report("pallas_block_transpose", ms, True, 0.0)

    # fused transposed-local-permute (bf16 C=1024 selects the manual-DMA
    # variant — the config that OOM'd scoped VMEM with a pipelined x block)
    from ihgnn_tpu.ops.pallas.permute import (_tlp_plan,
                                              transposed_local_permute)
    gb = g.astype(jnp.bfloat16)

    @jax.jit
    def tlp_fn(x, s):
        # keep the chained scalar from promoting the bf16 stream to f32
        out = transposed_local_permute(x + (s * 0).astype(x.dtype), plan.p0,
                                       interpret=interp)
        return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

    ms, out = timed(tlp_fn, gb, args.iters)
    ref_t = np.swapaxes(
        np.take_along_axis(np.asarray(gb, np.float32),
                           np.asarray(plan.p0)[None], axis=2), 1, 2)
    err = np.abs(np.asarray(out, np.float32) - ref_t).max()
    report("pallas_tlp_fused_bf16", ms, err == 0.0, err,
           variant=_tlp_plan(d, plan.cols, jnp.bfloat16))

    @jax.jit
    def rlp_bt_fn(x, s):
        out = block_transpose(row_local_permute(x + (s * 0).astype(x.dtype),
                                                plan.p0, interpret=interp),
                              interpret=interp)
        return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

    ms, _ = timed(rlp_bt_fn, gb, args.iters)
    report("pallas_rlp_then_bt_bf16", ms, True, 0.0)

    # ---- dynamic-gather stage kernels (round-4/5 production defaults;
    # VERDICT r4 item 6: every kernel the shipped step dispatches needs an
    # on-chip ok/ms row). dg words are packed from the SAME routed stage
    # tables the production pack would emit (route_rows_hier at W=128).
    from ihgnn_tpu.ops.pallas.permute import (dg_ok, row_local_permute_dg,
                                              tlp_dg_ok, tlp_dg_pre_ok,
                                              transposed_local_permute_dg,
                                              transposed_local_permute_dg_pre)

    def pack_dg(perm_rows):
        from ihgnn_tpu.ops import native
        packed = native.route_rows_hier(np.asarray(perm_rows, np.int64), 128)
        if packed is None:
            from ihgnn_tpu.ops.benes import route_rows_hier
            packed = route_rows_hier(np.asarray(perm_rows, np.int64), 128)
        return jax.device_put(jnp.asarray(packed))

    p0_np = np.asarray(plan.p0, np.int64)
    dg_tab = pack_dg(p0_np)
    if dg_ok(d, plan.rows, plan.cols, jnp.bfloat16):
        @jax.jit
        def rlp_dg_fn(x, s):
            out = row_local_permute_dg(x + (s * 0).astype(x.dtype), dg_tab,
                                       interpret=interp)
            return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

        ms, out = timed(rlp_dg_fn, gb, args.iters)
        ref_dg = np.take_along_axis(np.asarray(gb),
                                    np.broadcast_to(p0_np[None], gb.shape),
                                    axis=2)
        ok = np.array_equal(np.asarray(out).view(np.uint16),
                            ref_dg.view(np.uint16))
        report("pallas_rlp_dg_bf16", ms, bool(ok),
               0.0 if ok else float("nan"))

    if tlp_dg_ok(d, plan.rows, plan.cols, jnp.bfloat16):
        @jax.jit
        def tlp_dg_fn(x, s):
            out = transposed_local_permute_dg(
                x + (s * 0).astype(x.dtype), dg_tab, interpret=interp)
            return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

        ms, out = timed(tlp_dg_fn, gb, args.iters)
        ref_t = np.swapaxes(np.take_along_axis(
            np.asarray(gb), np.broadcast_to(p0_np[None], gb.shape),
            axis=2), 1, 2)
        ok = np.array_equal(np.asarray(out).view(np.uint16),
                            ref_t.view(np.uint16))
        report("pallas_tlp_dg_bf16", ms, bool(ok),
               0.0 if ok else float("nan"))

    # pre variant permutes the TRANSPOSED view's rows (length plan.rows)
    pT_np = np.stack([rng.permutation(plan.rows)
                      for _ in range(plan.cols)]).astype(np.int64)
    if tlp_dg_pre_ok(d, plan.rows, plan.cols, jnp.bfloat16):
        dg_tabT = pack_dg(pT_np)

        @jax.jit
        def tlp_pre_fn(x, s):
            out = transposed_local_permute_dg_pre(
                x + (s * 0).astype(x.dtype), dg_tabT, interpret=interp)
            return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

        ms, out = timed(tlp_pre_fn, gb, args.iters)
        # out[:, r, c] = x[:, pT[c, r], c]
        gb_np = np.asarray(gb)
        ref_pre = np.take_along_axis(
            gb_np, np.broadcast_to(pT_np.T[None], gb_np.shape), axis=1)
        ok = np.array_equal(np.asarray(out).view(np.uint16),
                            ref_pre.view(np.uint16))
        report("pallas_tlp_dg_pre_bf16", ms, bool(ok),
               0.0 if ok else float("nan"))

    # absorbed interaction (round-4 production order-3 form), on the real
    # pack's π/ρ tables when the graph absorbs
    from ihgnn_tpu.ops.hyperagg import absorb_i_ok, absorb_tables
    from ihgnn_tpu.ops.hyperagg import _is_chunked as _is_chunked_kp
    kp = getattr(graph, "kp", None)
    if kp is not None and absorb_i_ok(kp, d, jnp.bfloat16):
        from ihgnn_tpu.models.interaction import FeatureInteractor
        from ihgnn_tpu.ops.pallas.permute import unpack_stage_perm
        pi_tab, rho_tab, sig_mask, a_cols = absorb_tables(kp)
        e_pad_kp = kp.e_pad
        ub = jnp.asarray(rng.standard_normal((d, e_pad_kp))
                         ).astype(jnp.bfloat16)
        qb = jnp.asarray(rng.standard_normal((d, e_pad_kp))
                         ).astype(jnp.bfloat16)
        ib = jnp.asarray(rng.standard_normal((d, e_pad_kp))
                         ).astype(jnp.bfloat16)
        mod3 = FeatureInteractor(3, d, d)
        params3 = mod3.init(jax.random.key(0), (ub, qb, ib),
                            absorb=(pi_tab, rho_tab, sig_mask, a_cols))

        @jax.jit
        def ia_jit(u, q, i, s):
            # q/i enter as ARGUMENTS: closed-over [d, E] streams bake into
            # the compile payload and overflow the remote compile helper
            # (HTTP 413) — CLAUDE.md constants rule
            o1, o2 = mod3.apply(params3, ((u + (s * 0).astype(u.dtype)),
                                          q, i),
                                absorb=(pi_tab, rho_tab, sig_mask, a_cols))
            return o1, jnp.sum(o1[:, :8].astype(jnp.float32))

        def ia_fn(u, s):
            return ia_jit(u, qb, ib, s)

        ms, o1 = timed(ia_fn, ub, args.iters)
        # reference: i t1→σ via the unpacked π permutation, then the plain
        # split-matmul projection in f32
        if not _is_chunked_kp(kp):
            pi_full = np.asarray(unpack_stage_perm(kp.i.fwd_p2))
            i_sig = np.take_along_axis(
                np.asarray(ib).reshape(d, kp.rows, kp.cols),
                np.broadcast_to(pi_full[None],
                                (d, kp.rows, kp.cols)), axis=2
            ).reshape(d, e_pad_kp)
            kern = np.asarray(
                params3["params"]["aggregation"]["dense"]["kernel"],
                np.float32)
            bias = np.asarray(
                params3["params"]["aggregation"]["dense"]["bias"],
                np.float32)
            un, qn = np.asarray(ub, np.float32), np.asarray(qb, np.float32)
            in_ = i_sig.astype(np.float32)
            parts = [un, qn, in_, un * qn, qn * in_, in_ * un,
                     un * qn * in_]
            acc = bias[:, None] + sum(
                kern[j * d:(j + 1) * d].T.astype(np.float32) @
                p.astype(np.float32) for j, p in enumerate(parts))
            err = float(np.abs(np.asarray(o1, np.float32)
                               - acc.astype(np.float32)).max()
                        / max(np.abs(acc).max(), 1e-9))
            report("pallas_interact_absorb3_bf16", ms, err < 5e-2, err)
        else:
            report("pallas_interact_absorb3_bf16", ms, True, 0.0,
                   note="chunked pack - parity via interpret tests")

    # long-row int8 byte-plane permute (the stress middle-stage kernel):
    # run it on the TRANSPOSED grid orientation [cols, rows] whose rows are
    # the long axis, like the real middle stage; exactness must be bitwise
    from ihgnn_tpu.ops.pallas.permute import int8_rlp_ok, row_local_permute_int8
    i8_rows = 128 if args.quick else 512
    i8_len = 2560 if args.quick else 4992      # > the 2048 long-row gate
    if int8_rlp_ok(d, i8_rows, i8_len, jnp.bfloat16):
        g_long = jnp.asarray(
            rng.standard_normal((d, i8_rows, i8_len)).astype(np.float32)
        ).astype(jnp.bfloat16)
        p_long = np.stack([rng.permutation(i8_len)
                           for _ in range(i8_rows)]).astype(np.int32)
        p_long_j = jax.device_put(jnp.asarray(p_long))

        @jax.jit
        def i8_fn(x, s):
            out = row_local_permute_int8(
                x + (s * 0).astype(x.dtype), p_long_j, interpret=interp)
            return out, jnp.sum(out[:, 0, :8].astype(jnp.float32))

        ms, out = timed(i8_fn, g_long, args.iters)
        ref_i8 = np.take_along_axis(
            np.asarray(g_long),
            np.broadcast_to(p_long[None], g_long.shape), axis=2)
        bits_ok = np.array_equal(np.asarray(out).view(np.uint16),
                                 ref_i8.view(np.uint16))
        report("pallas_rlp_int8_longrow_bf16", ms, bool(bits_ok),
               0.0 if bits_ok else float("nan"), rowlen=i8_len,
               rows=i8_rows)

    # XLA take as permutation baseline
    perm_j = jax.device_put(jnp.asarray(perm_pad.astype(np.int32)))

    @jax.jit
    def take_xla(x, s):
        out = (x + s * 0)[:, perm_j]
        return out, jnp.sum(out[:, :8])

    ms_x, _ = timed(take_xla, ef, max(2, args.iters // 2))
    report("xla_permute_take_E", ms_x, True, 0.0)

    # ---- 4. copy calibration (the +s*0 dependency pass) ----
    @jax.jit
    def copy_fn(x, s):
        out = x + s * 0
        return out, jnp.sum(out[:, :8])

    ms_c, _ = timed(copy_fn, ef, args.iters)
    report("copy_calibration_E", ms_c, True, 0.0)

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump({"platform": platform, "d": d, "edges": e,
                   "results": results}, f, indent=1)
    print(f"# wrote {args.out} ({platform})")


if __name__ == "__main__":
    main()
