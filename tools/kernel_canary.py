"""Toolchain-regression canary for the production kernel envelope
(VERDICT r4 item 7).

Round 4 lost most of a day to a silent 20x regression of the flat int8
long-row permute (26 ms -> 525 ms/pass with byte-identical kernel code —
docs/STRESS_ACCOUNTING_r04.json); this script replays the kernels the
shipped step dispatches at FIXED shapes in ~2 minutes and flags any
>2x deviation from the committed baseline (docs/KERNEL_CANARY.json).

Rows (all bf16, the production stream dtype; timed amortized inside one
jitted lax.scan — scalar-fetch discipline per CLAUDE.md):

  production dispatch points on the real 2M bench pack (ops/hyperagg.py):
    u_expand            _expand (windowed one-hot gather)
    q_role_forward      _role_forward q chain (expand_t fused + tlp_dg)
    i_role_forward_pre  _role_forward i chain, stop_pre_p2 (absorb path)
    sig_inverse_q       _sig_inverse q (tlp_dg_pre single-pass)
    sig_inverse_i_pre   _sig_inverse i, from_pre=True
    segsum3             _segsum_regions (3-region CSR segment-sum)
    interact3_absorb    FeatureInteractor fwd+bwd, absorbed i-stage
  raw kernels at the bench stage shape [32, 2048, 1024]:
    rlp_dg / tlp_dg / tlp_dg_pre / rlp_hier
  the shape-fragile member at its proven stress shape [32, 1024, 9856]:
    int8_longrow        row_local_permute_int8 (the round-4 incident)

Usage:
  python tools/kernel_canary.py                  # check vs baseline
  python tools/kernel_canary.py --write_baseline # (re)record baseline

Exit code 1 on any regression >2x. Run alone on the TPU (single-tenant).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE = "/root/repo/docs/KERNEL_CANARY.json"
RATIO = 2.0


def amortized(fn, *args, iters=15):
    """ms/iter with the loop inside one jit (scan, scalar perturbation)."""
    @jax.jit
    def loop(*a):
        def body(c, _):
            return fn(*a, 1.0 + 0.0 * c), None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c
    _ = float(loop(*args))          # compile + warm
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write_baseline", action="store_true")
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    os.environ.setdefault("IHGNN_PACK_COLS", "2048")   # the bench form

    from bench import build_bench_graph
    from ihgnn_tpu.models.interaction import FeatureInteractor
    from ihgnn_tpu.ops.hyperagg import (_expand, _role_forward, _segsum_regions,
                                        _sig_inverse, absorb_tables)
    from ihgnn_tpu.ops.pallas.permute import (int8_rlp_ok,
                                              row_local_permute_dg,
                                              row_local_permute_hier,
                                              row_local_permute_int8,
                                              transposed_local_permute_dg,
                                              transposed_local_permute_dg_pre)

    print("# loading 2M bench pack...", flush=True)
    graph, _ = build_bench_graph(200_000, 100_000, 400_000, 2_000_000)
    graph = jax.tree.map(jnp.asarray, graph)
    kp = graph.kp
    D, R, C = 32, kp.rows, kp.cols
    rng = np.random.default_rng(0)

    xp = jnp.asarray(rng.standard_normal((D, kp.src_pad))
                     .astype(np.float32)).astype(jnp.bfloat16)
    ef = jnp.asarray(rng.standard_normal((D, kp.e_pad))
                     .astype(np.float32)).astype(jnp.bfloat16)
    xg = jnp.asarray(rng.standard_normal((D, R, C))
                     .astype(np.float32)).astype(jnp.bfloat16)
    # the mid-stage tables act on the TRANSPOSED grid ([C, R] tables)
    xgT = jnp.asarray(rng.standard_normal((D, C, R))
                      .astype(np.float32)).astype(jnp.bfloat16)

    results = {}

    def rec(name, ms):
        results[name] = round(ms, 3)
        print(f"{name:22s} {ms:8.3f} ms", flush=True)

    # --- production dispatch points on the real pack -----------------------
    rec("u_expand", amortized(
        lambda x, kp, s: jnp.sum(
            _expand((x * s).astype(x.dtype), kp.u_expand)[:, :8]
            .astype(jnp.float32)), xp, kp, iters=args.iters))
    rec("q_role_forward", amortized(
        lambda x, kp, s: jnp.sum(
            _role_forward((x * s).astype(x.dtype), kp.q, kp.rows, kp.cols)
            [:, :8].astype(jnp.float32)), xp, kp, iters=args.iters))
    rec("i_role_forward_pre", amortized(
        lambda x, kp, s: jnp.sum(
            _role_forward((x * s).astype(x.dtype), kp.i, kp.rows, kp.cols,
                          stop_pre_p2=True)[:, :8].astype(jnp.float32)),
        xp, kp, iters=args.iters))
    rec("sig_inverse_q", amortized(
        lambda e, kp, s: jnp.sum(
            _sig_inverse((e * s).astype(e.dtype), kp.q, kp.rows, kp.cols)
            [:, :8].astype(jnp.float32)), ef, kp, iters=args.iters))
    rec("sig_inverse_i_pre", amortized(
        lambda e, kp, s: jnp.sum(
            _sig_inverse((e * s).astype(e.dtype), kp.i, kp.rows, kp.cols,
                         from_pre=True)[:, :8].astype(jnp.float32)),
        ef, kp, iters=args.iters))
    rec("segsum3", amortized(
        lambda e, kp, s: jnp.sum(
            _segsum_regions((e * s).astype(e.dtype), e, e, kp)[:, :8]),
        ef, kp, iters=args.iters))

    # --- absorbed interaction fwd+bwd (production order-3 form) ------------
    mod3 = FeatureInteractor(3, D, D)
    roles = (ef, ef, ef)
    pi_tab, rho_tab, sig_mask, a_cols = absorb_tables(kp)
    p3 = mod3.init(jax.random.key(0), roles,
                   absorb=(pi_tab, rho_tab, sig_mask, a_cols))

    def ia_both(r0, r1, r2, params, pi, rho, s):
        # cols is a static int and sig_mask may be None — both stay in the
        # closure (a traced int would land in a custom_vjp nondiff slot)
        def loss(r0, params):
            o1, o2 = mod3.apply(params, ((r0 * s).astype(r0.dtype), r1, r2),
                                absorb=(pi, rho, sig_mask, a_cols))
            return (jnp.sum((o1 * o1).astype(jnp.float32))
                    + jnp.sum((o2 * o2).astype(jnp.float32)))
        l, (g0, gp) = jax.value_and_grad(loss, argnums=(0, 1))(r0, params)
        return l + 0 * jnp.sum(g0.astype(jnp.float32))

    rec("interact3_absorb", amortized(ia_both, *roles, p3, pi_tab, rho_tab,
                                      iters=args.iters))

    # --- raw stage kernels at the bench stage shape ------------------------
    st_p1 = kp.q.fwd_p1          # dg table at [R, C]
    st_inv = kp.q.inv_p1
    assert st_p1.kind == "dg" and st_inv.kind == "dg", (
        st_p1.kind, st_inv.kind)
    rec("rlp_dg", amortized(
        lambda x, t, s: jnp.sum(
            row_local_permute_dg((x * s).astype(x.dtype), t)[:, 0, :8]
            .astype(jnp.float32)), xgT, st_p1.tab, iters=args.iters))
    rec("tlp_dg", amortized(
        lambda x, t, s: jnp.sum(
            transposed_local_permute_dg((x * s).astype(x.dtype), t)[:, 0, :8]
            .astype(jnp.float32)), xgT, st_p1.tab, iters=args.iters))
    rec("tlp_dg_pre", amortized(
        lambda x, t, s: jnp.sum(
            transposed_local_permute_dg_pre((x * s).astype(x.dtype), t)
            [:, 0, :8].astype(jnp.float32)), xg, st_inv.tab,
        iters=args.iters))
    from ihgnn_tpu.ops.pallas.permute import block_transpose
    rec("bt", amortized(
        lambda x, s: jnp.sum(
            block_transpose((x * s).astype(x.dtype))[:, 0, :8]
            .astype(jnp.float32)), xg, iters=args.iters))

    # hier fallback (covers shapes outside dg_ok)
    from ihgnn_tpu.ops.packing import _stage_table
    os.environ["IHGNN_STAGE_KIND"] = "hier"
    try:
        st_h = _stage_table(np.stack([rng.permutation(C) for _ in range(R)])
                            .astype(np.int32))
    finally:
        del os.environ["IHGNN_STAGE_KIND"]
    assert st_h.kind == "hier", st_h.kind
    rec("rlp_hier", amortized(
        lambda x, t, s: jnp.sum(
            row_local_permute_hier((x * s).astype(x.dtype), t, w=st_h.w)
            [:, 0, :8].astype(jnp.float32)), xg, jnp.asarray(st_h.tab),
        iters=args.iters))

    # --- the shape-fragile int8 long-row kernel at its proven shape --------
    RL, CL = 1024, 9856
    assert int8_rlp_ok(D, RL, CL, jnp.bfloat16)
    xl = jnp.asarray(rng.standard_normal((D, RL, CL))
                     .astype(np.float32)).astype(jnp.bfloat16)
    pl_ = jnp.asarray(np.stack([rng.permutation(CL) for _ in range(RL)])
                      .astype(np.int32))
    rec("int8_longrow", amortized(
        lambda x, p, s: jnp.sum(
            row_local_permute_int8((x * s).astype(x.dtype), p)[:, 0, :8]
            .astype(jnp.float32)), xl, pl_, iters=max(3, args.iters // 3)))

    # --- compare vs baseline ----------------------------------------------
    if args.write_baseline or not os.path.exists(BASELINE):
        with open(BASELINE, "w") as fh:
            json.dump({"note": "kernel canary baseline (ms, bf16); "
                               "tools/kernel_canary.py flags >2x",
                       "kernels": results}, fh, indent=1)
        print(f"# baseline written -> {BASELINE}")
        return 0

    with open(BASELINE) as fh:
        base = json.load(fh)["kernels"]
    bad = []
    for name, ms in results.items():
        ref = base.get(name)
        if ref is None:
            print(f"# NEW row (no baseline): {name}")
            continue
        ratio = ms / ref
        flag = " <-- REGRESSION" if ratio > RATIO else (
            " (improved)" if ratio < 1 / RATIO else "")
        print(f"{name:22s} {ms:8.3f} ms  baseline {ref:8.3f}  "
              f"x{ratio:.2f}{flag}")
        if ratio > RATIO:
            bad.append((name, ref, ms))
    if bad:
        print(f"# {len(bad)} kernel(s) regressed >2x: "
              + ", ".join(n for n, _, _ in bad))
        return 1
    print("# canary clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
