"""Host-side kernel packing: graph structure → Pallas operand pytrees.

Everything the fast hypergraph pipeline needs is static per graph and
computed once here (NumPy + the native routing library):

* role expansions — windowed-gather packs (ops/pallas/gather.py) over the
  role-sorted endpoint ids; for q/i the Beneš stage-0 shuffle is COMPOSED
  into the gather index table (saves one full [d, E] round-trip per
  permutation), leaving only stages T·p1·T·p2 to run on device.
* role permutations (edge order ↔ role-rank order) — Clos plans routed by
  csrc/routing.cc.
* the node-major CSR segment-sum pack (ops/pallas/segsum.py) over the 3E
  incidence entries.

Reference counterpart: none — the reference keeps torch COO tensors and
lets torch_sparse/dgl CUDA kernels do dynamic gather/scatter
(/root/reference/Helpers/Graph.py:71-77, Models/GnnLayers.py:233). On TPU
the winning strategy is to precompute static routed layouts so the hot
loop is pure dense MXU/DMA work.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ihgnn_tpu.ops.benes import HIER_W, hier_eligible
from ihgnn_tpu.ops.pallas.gather import CHUNK, pack_windows
from ihgnn_tpu.ops.pallas.permute import StageTable, pick_grid
from ihgnn_tpu.ops.pallas.segsum import pack_csr_tiles

# A banded-gather row may span at most this many source columns; beyond it
# (pathologically sparse id ranges) the graph falls back to XLA ops.
W_CAP = 16384

# Windowed-gather row width, decoupled from the Clos routing width: the
# expansion wants WIDE rows (fewer, larger window DMAs — it is
# DMA-latency-bound), while the permutation stages want NARROW rows (the
# one-hot matmul costs ∝ cols per entry — they are MXU-bound). The flat
# [e_pad] layout is shared, so the expansion may view it as
# [e_pad/1024, 1024] while the stages run on [rows, cols], provided
# EXPAND_COLS is a multiple of cols (stage-0 shuffles within cols-rows are
# then also within EXPAND_COLS-rows, preserving bandedness).
EXPAND_COLS = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@struct.dataclass
class ExpandPack:
    """Operands for ops/pallas/gather.windowed_gather."""
    idx: Any                                   # [R, C/128, 128] int32
    win: Any                                   # [R] int32
    w: int = struct.field(pytree_node=False, default=0)
    src_pad: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class RolePack:
    """Per-role (q/i) operands.

    Non-σ layout (sharded packs, 2D role SpMM):
    fwd (role-sorted → edge order, used by gather-forward and
    scatter-backward): ``gather`` composes expand∘stage0; then
    T, fwd_p1, T, fwd_p2.
    bwd (edge order → role-rank order, used by scatter-forward and
    gather-backward): stages p0, T, p1, T only — the final stage p2 is
    consumed at pack time by storing the segment-sum ids in pre-p2
    ("t1") order, which the segsum kernel tolerates because stage 2 only
    shuffles within rows contained in its DMA blocks.

    σ layout (single-chip hyper packs, ``HyperKernelPack.sigma``): the
    interaction runs in the q-role's PRE-p2 state σ (a row-local scramble
    of edge order), so the whole q round-trip drops its final Clos stage
    in BOTH directions — see build_hyper_kernel_pack. Then:
    fwd (rank → σ): gather (expand∘stage0), T, fwd_p1 [, fwd_p2 — i role
    only, composed with the σ re-label]; fwd_p2 is None for q.
    inv (σ → rank order, used by scatter-forward and gather-backward):
    [inv_p2 — i role only], T, inv_p1, T; the leading stage-0⁻¹ is
    consumed by storing segment-sum ids in stage-0 order (same in-block
    tolerance as above). inv_* are None in the non-σ layout.
    """
    gather: ExpandPack
    fwd_p1: StageTable                         # [C, R]
    fwd_p2: StageTable                         # [R, C]; None for σ q role
    bwd_p0: StageTable                         # [R, C]; None in σ layout
    bwd_p1: StageTable                         # [C, R]; None in σ layout
    inv_p1: StageTable = None                  # [C, R]; σ layout only
    inv_p2: StageTable = None                  # [R, C]; σ i role only


@struct.dataclass
class ChunkedHyperPack:
    """K per-chunk HyperKernelPacks over contiguous edge slices (round 4).

    A 10M-edge grid at cols=1024 has 9856-entry rows in the transposed
    orientation — past the dg/hier exchange cap (B <= 16), where the flat
    int8 long-row kernel measures ~525 ms/pass on today's toolchain
    (docs/STRESS_ACCOUNTING_r04.json sig_inverse_q: 555 ms vs 3.1 floor;
    x16 passes = the whole 11.2 s stress step). Chunking splits the edge
    axis into contiguous slices that each pack at the PROVEN [<=2048,
    1024] grid where every stage kernel is dg-eligible — the same
    edge-sharding math the multi-chip path uses, applied on one chip:
    role chains run per chunk and concatenate (chunk slices are
    contiguous in u-sorted edge order, so the concat IS global edge
    order), scatter segment-sums run per chunk into [d, N] partials and
    add. The i-role interaction absorption survives: all chunks share
    ``cols``, so the per-chunk p2 tables concatenate along the row axis
    into one table the interaction kernel consumes unchanged
    (``absorb_tables``)."""
    packs: Any                 # tuple of HyperKernelPack, uniform cols
    e: int = struct.field(pytree_node=False, default=0)
    n: int = struct.field(pytree_node=False, default=0)
    e_pad: int = struct.field(pytree_node=False, default=0)  # sum e_pad
    cols: int = struct.field(pytree_node=False, default=0)
    src_pad: int = struct.field(pytree_node=False, default=0)  # max
    sigma: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class HyperKernelPack:
    """All device operands for the Pallas hypergraph aggregation."""
    u_expand: ExpandPack                       # u-role: expansion only
    q: RolePack
    i: RolePack
    ids2d: Any                                 # [K_pad/128, 128] int32
    tile_ptr: Any                              # [T+1] int32
    # σ layout only: validity of each σ position (pad edges interleave
    # within rows, so tails can't be sliced/zeroed positionally); None
    # when e == e_pad. [1, e_pad] f32.
    sig_mask: Any = None
    # σ layout only: the q-role's final Clos stage (σ → edge order), for
    # consumers that need TRUE edge order (phase-2 attention).
    sig_stage: StageTable = None
    # segsum DMA-block size: = max(1024, cols) so Clos-stage absorption
    # stays within blocks (ops/pallas/segsum.py)
    seg_block: int = struct.field(pytree_node=False, default=1024)
    e: int = struct.field(pytree_node=False, default=0)       # true E
    n: int = struct.field(pytree_node=False, default=0)       # node count
    e_pad: int = struct.field(pytree_node=False, default=0)   # R*C
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    src_pad: int = struct.field(pytree_node=False, default=0)  # node pad
    k_pad: int = struct.field(pytree_node=False, default=0)    # segsum pad
    # σ layout: the interaction/aggregation streams run in the q-role's
    # pre-p2 order instead of edge order (row-local relabeling; free for
    # the u expansion and the segment-sum ids, saves the q round-trip's
    # final Clos stage in both directions)
    sigma: bool = struct.field(pytree_node=False, default=False)


def _route(perm: np.ndarray, rows: int, cols: int
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    from ihgnn_tpu.ops import native
    routed = native.benes_route(perm, rows, cols)
    if routed is None:
        from ihgnn_tpu.ops.benes import benes_route_rect
        routed = benes_route_rect(perm, rows, cols)
    return tuple(np.asarray(p, np.int32) for p in routed)


# hier block-width preference, widest first: W=256 (B=C/256 blocks)
# measured faster than the original W=128 on-chip — the stage kernels are
# matmul-issue/VPU-bound, not MXU-weight-load-bound, so halving the matmul
# count and the exchange chain beats halving the one-hot depth
# (docs/KERNELS.md round 3). Override for A/B probes via
# ``IHGNN_HIER_W`` in the environment.
HIER_W_PREF = (256, 128)


def _pick_hier_w(length: int) -> Optional[int]:
    import os
    env = os.environ.get("IHGNN_HIER_W")
    prefs = (int(env),) if env else HIER_W_PREF
    for w in prefs:
        if hier_eligible(length, w):
            return w
    return None


def _stage_table(raw: np.ndarray) -> StageTable:
    """Pack one row-local stage table for the device kernels.

    Default (round 4): kind="dg" — the W=128 hier word format executed
    with tpu.dynamic_gather in-block levels (ops/pallas/permute.py
    row_local_permute_dg; measured faster than every one-hot variant at
    short rows AND exact in all dtypes, docs/DG2_PROBE.json). Rows too
    long for the dg exchange (B > 16) or with the override
    ``IHGNN_STAGE_KIND=hier`` fall through to the one-hot path below:
    route through the second-level [B, W] Clos when the row length
    allows it (ops/benes.py hier_eligible), else keep the flat
    permutation.

    The butterfly packing (kind="bfly", pure-VPU roll+select) measured
    SLOWER on-chip for these wide rows — rolls over >128-lane vectors
    lower to dynamic rotates across vector registers (7.3 ms vs the hier
    pair's 3.3 ms f32 at 2M x 32), and pltpu.roll cannot rotate 16-bit
    data at all — so hier stays the default; bfly remains available for
    single-register (128-lane) uses like ops/pallas/segscan.py."""
    import os
    length = raw.shape[1]
    if os.environ.get("IHGNN_STAGE_KIND", "dg") == "dg" and length == 128:
        # single-block rows (b = 1, below hier_eligible's b >= 2): the
        # permute is one in-block gather — synthesize the word directly
        # (p0 = perm, s = 0, p2 = identity)
        ident = np.arange(128, dtype=np.int64) << 20
        packed = (np.asarray(raw, np.int64) + ident[None, :]).astype(np.int32)
        return StageTable(tab=jnp.asarray(packed), kind="dg", w=128)
    if (os.environ.get("IHGNN_STAGE_KIND", "dg") == "dg"
            and hier_eligible(length, 128)):
        from ihgnn_tpu.ops import native
        packed = native.route_rows_hier(raw, 128)
        if packed is None:
            from ihgnn_tpu.ops.benes import route_rows_hier
            packed = route_rows_hier(raw, 128)
        return StageTable(tab=jnp.asarray(packed), kind="dg", w=128)
    w = _pick_hier_w(length)
    if w is None:
        return StageTable(tab=jnp.asarray(raw, jnp.int32), kind="flat")
    from ihgnn_tpu.ops import native
    packed = native.route_rows_hier(raw, w)
    if packed is None:
        from ihgnn_tpu.ops.benes import route_rows_hier
        packed = route_rows_hier(raw, w)
    return StageTable(tab=jnp.asarray(packed), kind="hier", w=w)


def _pad_perm(perm: np.ndarray, e_pad: int) -> np.ndarray:
    e = perm.shape[0]
    return np.concatenate([np.asarray(perm, np.int64),
                           np.arange(e, e_pad, dtype=np.int64)])


def _role_pack(role_ids: np.ndarray, order: np.ndarray, rank: np.ndarray,
               rows: int, cols: int, pool: ThreadPoolExecutor,
               with_bwd: bool = True, raw_out: Optional[dict] = None):
    """Build (RolePack, segsum ids in t1 order) for one role.

    role_ids: [E] endpoint node ids in edge order.
    order:    [E] argsort(role_ids) — role-rank → edge id.
    rank:     [E] inverse of order — edge id → role rank.
    with_bwd: route the edge→rank direction too; symmetric consumers
      (Graph2D SpMM) skip it and get bwd fields None / ids None.
    """
    e = role_ids.shape[0]
    e_pad = rows * cols
    fwd_f = pool.submit(_route, _pad_perm(rank, e_pad), rows, cols)
    bwd_f = (pool.submit(_route, _pad_perm(order, e_pad), rows, cols)
             if with_bwd else None)

    sorted_ids = role_ids[order]
    sorted_pad = np.concatenate([
        sorted_ids, np.full(e_pad - e, sorted_ids[-1] if e else 0,
                            sorted_ids.dtype)])

    f0, f1, f2 = fwd_f.result()
    if raw_out is not None:
        # callers that absorb the forward's final stage into their own
        # consumer ids need the RAW table (ops/bag.py query-segsum)
        raw_out["f2"] = f2
    # compose expand with the forward stage-0 shuffle: stage 0 reads
    # in-row positions, so the fused source id is sorted_pad[r*C + f0[r,c]]
    # and rows stay banded (the window is the row's sorted-id range);
    # the gather itself runs on EXPAND_COLS-wide rows of the same flat
    # layout (cols | EXPAND_COLS, so stage-0 shuffles stay in-row)
    idx = np.take_along_axis(sorted_pad.reshape(rows, cols),
                             f0.astype(np.int64), axis=1)
    gp = pack_windows(idx.reshape(-1, EXPAND_COLS), w_cap=W_CAP)

    if not with_bwd:
        st_futs = [pool.submit(_stage_table, t) for t in (f1, f2)]
        rp = RolePack(
            gather=ExpandPack(idx=gp.idx_rel, win=gp.win, w=gp.w,
                              src_pad=gp.src_pad),
            fwd_p1=st_futs[0].result(), fwd_p2=st_futs[1].result(),
            bwd_p0=None, bwd_p1=None,
        )
        return rp, None, sorted_ids

    b0, b1, b2 = bwd_f.result()
    # absorb bwd stage 2 into the segment-sum: store the region's node ids
    # in pre-p2 order (the value at t1 position (r, p2[r, c]) belongs at
    # rank r*C + c); ranks >= E get int32-max sentinels (dropped in-kernel)
    ids_final = np.concatenate([
        sorted_ids.astype(np.int64), np.full(e_pad - e, 2**31 - 1, np.int64)])
    ids_t1 = np.empty((rows, cols), np.int64)
    np.put_along_axis(ids_t1, b2.astype(np.int64),
                      ids_final.reshape(rows, cols), axis=1)

    st_futs = [pool.submit(_stage_table, t) for t in (f1, f2, b0, b1)]
    rp = RolePack(
        gather=ExpandPack(idx=gp.idx_rel, win=gp.win, w=gp.w,
                          src_pad=gp.src_pad),
        fwd_p1=st_futs[0].result(), fwd_p2=st_futs[1].result(),
        bwd_p0=st_futs[2].result(), bwd_p1=st_futs[3].result(),
    )
    return rp, ids_t1.reshape(-1).astype(np.int32), sorted_ids


def _row_inverse(p: np.ndarray) -> np.ndarray:
    """Per-row inverse of a [NR, L] row-permutation table."""
    nr, length = p.shape
    inv = np.empty_like(p)
    np.put_along_axis(inv, np.asarray(p, np.int64),
                      np.broadcast_to(np.arange(length, dtype=p.dtype),
                                      (nr, length)), axis=1)
    return inv


def build_hyper_kernel_pack(i3: np.ndarray, node_count: int,
                            cols: int = 1024, sigma: bool = True,
                            chunk_rows_cap: Optional[int] = None):
    """Pack a HyperGraph's structure for the Pallas pipeline, or None when
    any banded-gather row exceeds W_CAP (XLA fallback).

    i3: [E, 3] endpoint ids, edge order (u-sorted).

    cols is capped at 1024: the stage-2-into-segsum and stage-0-into-
    expand fusions require Clos rows to nest inside the 1024-entry segsum
    DMA blocks / expand rows. (The 2D-graph role pack, which has neither
    fusion, uses c=2048 at scale — graph.py.)

    ``sigma``: run the interaction pipeline in the q-role's PRE-final-
    stage order σ instead of edge order. σ differs from edge order by a
    row-local scramble, which is FREE to compose into the u-role's
    windowed-expand index table and into the segment-sum id layout
    (in-block order tolerance), so the q role drops its final Clos stage
    in BOTH directions — 4 stage passes saved per layer fwd+bwd. The
    sharded packs keep sigma=False (they slice exact-e edge tails, which
    σ interleaves into rows).

    Long-row grids: C stays 1024. The squarer C=2048 grid (halving the
    long [C, R] stage's row length, round-3 experiment) measured FASTER
    per-kernel (int8 long stage 26.1 → 15.4 ms/pass) but the COMPOSED
    step collapsed to 6.5 s vs 1.31 s at C=1024 — isolated-kernel and
    composed timings disagree wildly at that shape (isolated gather 3.7 s
    > the whole layer fwd 1.5 s that contains it), pointing at a
    shape-dependent XLA/Mosaic lowering pathology this round did not
    root-cause (the int8 sublane-concat trap was one such; fixed, did not
    recover the step). Machinery for wider grids (per-pack seg_block,
    cols-wide expand rows) stays in place and tested for when it does.
    Override for probes via ``IHGNN_PACK_COLS`` in the environment.
    """
    import os
    e = i3.shape[0]
    if e == 0:
        return None
    env_cols = os.environ.get("IHGNN_PACK_COLS")
    if env_cols is not None:
        cols = int(env_cols)
    if os.environ.get("IHGNN_SIGMA") == "0":    # A/B probe override
        sigma = False
    # an explicit override is authoritative (bypasses the sqrt-ish cap):
    # wide grids shorten the transposed mid stage — see pick_grid
    rows, cols = pick_grid(e, cols, force_c=env_cols is not None)

    # Long grids chunk into contiguous edge slices that each pack at a
    # dg-eligible [<= cap, cols] grid (see ChunkedHyperPack). σ path only
    # (the sharded per-shard packs are small and slice exact-e tails).
    if chunk_rows_cap is None:
        chunk_rows_cap = int(os.environ.get("IHGNN_CHUNK_ROWS_CAP", "2048"))
    if sigma and chunk_rows_cap and rows > chunk_rows_cap:
        s = chunk_rows_cap * cols
        k = -(-e // s)
        subs = []
        for j in range(k):
            pk = build_hyper_kernel_pack(i3[j * s:(j + 1) * s], node_count,
                                         cols, sigma=True, chunk_rows_cap=0)
            if pk is None:
                return None
            subs.append(pk)
        src_pad = max(pk.src_pad for pk in subs)
        # windowed_gather tolerates sources LONGER than a pack's own
        # src_pad, so unifying the static field is enough — the chains
        # pad x once to the max
        subs = [pk.replace(src_pad=src_pad) for pk in subs]
        return ChunkedHyperPack(
            packs=tuple(subs), e=e, n=int(node_count),
            e_pad=sum(pk.e_pad for pk in subs), cols=cols,
            src_pad=src_pad, sigma=True)

    e_pad = rows * cols
    exp_cols = max(EXPAND_COLS, cols)
    seg_block = max(1024, cols)

    from ihgnn_tpu.ops.pallas.segsum import TILE_N
    # the stage-2-into-segsum fusion requires Clos rows to nest inside the
    # segsum DMA blocks (within-block shuffles are order-transparent)
    assert cols <= seg_block and seg_block % cols == 0, (cols, seg_block)
    # stage-0-into-expand fusion requires Clos rows to nest inside the
    # (wider) windowed-gather rows
    assert cols <= exp_cols and exp_cols % cols == 0, cols

    if not sigma:
        return _build_pack_edge_order(i3, node_count, rows, cols)

    sent = 2**31 - 1
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            u_ids = np.asarray(i3[:, 0], np.int64)
            u_pad = np.concatenate([u_ids, np.full(e_pad - e, u_ids[-1])])

            # route rank→edge for q and i (σ needs NO inverse routing:
            # the inverse chains reuse row-inverted forward tables)
            stages, sorted_role, sorted_pad = {}, {}, {}
            futs = {}
            for name, col_idx in (("q", 1), ("i", 2)):
                ids = np.asarray(i3[:, col_idx], np.int64)
                order = np.argsort(ids, kind="stable")
                rank = np.empty(e, np.int64)
                rank[order] = np.arange(e)
                futs[name] = pool.submit(_route, _pad_perm(rank, e_pad),
                                         rows, cols)
                s = ids[order]
                sorted_role[name] = s
                sorted_pad[name] = np.concatenate(
                    [s, np.full(e_pad - e, s[-1] if e else 0, s.dtype)])
            f_q = futs["q"].result()
            f_i = futs["i"].result()

            # σ relabeling: σ position (r, j) holds edge (r, p2q_inv[r, j])
            p2q = np.asarray(f_q[2], np.int64)
            p2q_inv = _row_inverse(p2q)
            esig = (np.arange(rows, dtype=np.int64)[:, None] * cols
                    + p2q_inv)                                   # [R, C]

            # u role: expansion composed with the σ relabeling (same id
            # set per row → identical windows)
            up = pack_windows(u_pad[esig.reshape(-1)]
                              .reshape(-1, exp_cols), w_cap=W_CAP)

            # i role: final stage composed with the σ relabeling
            p2i = np.take_along_axis(np.asarray(f_i[2], np.int64), p2q_inv,
                                     axis=1)

            def gather_pack(name, f0):
                idx = np.take_along_axis(
                    sorted_pad[name].reshape(rows, cols),
                    np.asarray(f0, np.int64), axis=1)
                return pack_windows(idx.reshape(-1, exp_cols),
                                    w_cap=W_CAP)
            gp_q = gather_pack("q", f_q[0])
            gp_i = gather_pack("i", f_i[0])

            st = {k: pool.submit(_stage_table, t) for k, t in {
                "q_p1": f_q[1], "q_p1i": _row_inverse(np.asarray(f_q[1])),
                "i_p1": f_i[1], "i_p1i": _row_inverse(np.asarray(f_i[1])),
                "i_p2": p2i, "i_p2i": _row_inverse(p2i),
                "sig": p2q,
            }.items()}

            def as_expand(gp):
                return ExpandPack(idx=gp.idx_rel, win=gp.win, w=gp.w,
                                  src_pad=gp.src_pad)

            q_pack = RolePack(gather=as_expand(gp_q),
                              fwd_p1=st["q_p1"].result(), fwd_p2=None,
                              bwd_p0=None, bwd_p1=None,
                              inv_p1=st["q_p1i"].result(), inv_p2=None)
            i_pack = RolePack(gather=as_expand(gp_i),
                              fwd_p1=st["i_p1"].result(),
                              fwd_p2=st["i_p2"].result(),
                              bwd_p0=None, bwd_p1=None,
                              inv_p1=st["i_p1i"].result(),
                              inv_p2=st["i_p2i"].result())
    except ValueError:
        return None

    # segment-sum ids: regions [u | q | i], each e_pad wide. The inverse
    # chains end one row-local stage EARLY; that stage is absorbed by
    # storing ids in the corresponding scrambled order (all scrambles stay
    # inside cols-rows ⊂ 1024-entry segsum blocks):
    #   u region: values arrive in σ order → ids at esig positions
    #   q/i regions: values arrive in stage-0 order → ids at f0 positions
    def region_ids(name, f0):
        ids_final = np.concatenate([
            sorted_role[name], np.full(e_pad - e, sent, np.int64)])
        return np.take_along_axis(ids_final.reshape(rows, cols),
                                  np.asarray(f0, np.int64),
                                  axis=1).reshape(-1).astype(np.int32)

    u_region = np.where(esig.reshape(-1) < e,
                        u_pad[np.minimum(esig.reshape(-1), e - 1)],
                        sent).astype(np.int32)
    ids_all = np.concatenate([u_region, region_ids("q", f_q[0]),
                              region_ids("i", f_i[0])])
    k_pad = 3 * e_pad

    n_tiles = _round_up(max(node_count, 1), TILE_N) // TILE_N
    bounds = np.arange(0, (n_tiles + 1) * TILE_N, TILE_N)
    pu = np.searchsorted(u_ids, bounds)
    pq = np.searchsorted(sorted_role["q"], bounds)
    pi = np.searchsorted(sorted_role["i"], bounds)
    tile_ptr = np.where(pu < e, pu,
                        np.where(pq < e, e_pad + pq,
                                 2 * e_pad + pi)).astype(np.int32)

    src_pad = max(up.src_pad, gp_q.src_pad, gp_i.src_pad,
                  _round_up(node_count, CHUNK))
    sig_mask = None
    if e != e_pad:
        sig_mask = jnp.asarray((esig.reshape(1, -1) < e)
                               .astype(np.float32))
    return HyperKernelPack(
        u_expand=ExpandPack(idx=up.idx_rel, win=up.win, w=up.w,
                            src_pad=up.src_pad),
        q=q_pack, i=i_pack,
        ids2d=jnp.asarray(ids_all.reshape(-1, 128)),
        tile_ptr=jnp.asarray(tile_ptr),
        sig_mask=sig_mask, sig_stage=st["sig"].result(),
        seg_block=seg_block,
        e=e, n=int(node_count), e_pad=e_pad, rows=rows, cols=cols,
        src_pad=src_pad, k_pad=k_pad, sigma=True,
    )


def _build_pack_edge_order(i3: np.ndarray, node_count: int, rows: int,
                           cols: int) -> Optional[HyperKernelPack]:
    """The non-σ (edge-order) pack — used by the sharded per-shard packs,
    whose exact-e tail slicing needs pads at the END of the edge axis."""
    from ihgnn_tpu.ops.pallas.segsum import TILE_N
    e = i3.shape[0]
    e_pad = rows * cols
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            u_ids = np.asarray(i3[:, 0], np.int64)
            # u region: edge order IS u-sorted order — expansion only
            u_pad = np.concatenate([u_ids, np.full(e_pad - e, u_ids[-1])])
            up = pack_windows(u_pad.reshape(-1, EXPAND_COLS), w_cap=W_CAP)

            packs, region_ids, region_sorted = {}, {}, {}
            for name, col_idx in (("q", 1), ("i", 2)):
                ids = np.asarray(i3[:, col_idx], np.int64)
                order = np.argsort(ids, kind="stable")
                rank = np.empty(e, np.int64)
                rank[order] = np.arange(e)
                packs[name], region_ids[name], region_sorted[name] = \
                    _role_pack(ids, order, rank, rows, cols, pool)
    except ValueError:
        return None

    # segment-sum operands: regions [u | q-rank | i-rank], each e_pad wide
    # (tails are sentinels), q/i ids stored in t1 order (stage-2 fusion)
    u_region_ids = np.concatenate([
        u_ids.astype(np.int32), np.full(e_pad - e, 2**31 - 1, np.int32)])
    ids_all = np.concatenate([u_region_ids, region_ids["q"],
                              region_ids["i"]])
    k_pad = 3 * e_pad

    # tile_ptr: first concat-layout position holding a node >= each tile
    # boundary; piecewise because regions are separated by sentinel tails
    n_tiles = _round_up(max(node_count, 1), TILE_N) // TILE_N
    bounds = np.arange(0, (n_tiles + 1) * TILE_N, TILE_N)
    pu = np.searchsorted(u_ids, bounds)
    pq = np.searchsorted(region_sorted["q"], bounds)
    pi = np.searchsorted(region_sorted["i"], bounds)
    tile_ptr = np.where(pu < e, pu,
                        np.where(pq < e, e_pad + pq,
                                 2 * e_pad + pi)).astype(np.int32)

    src_pad = max(up.src_pad, packs["q"].gather.src_pad,
                  packs["i"].gather.src_pad,
                  _round_up(node_count, CHUNK))
    return HyperKernelPack(
        u_expand=ExpandPack(idx=up.idx_rel, win=up.win, w=up.w,
                            src_pad=up.src_pad),
        q=packs["q"], i=packs["i"],
        ids2d=jnp.asarray(ids_all.reshape(-1, 128)),
        tile_ptr=jnp.asarray(tile_ptr),
        e=e, n=int(node_count), e_pad=e_pad, rows=rows, cols=cols,
        src_pad=src_pad, k_pad=k_pad,
    )


@struct.dataclass
class ShardedHyperPack:
    """Per-edge-shard kernel packs, stacked for ``shard_map`` dispatch.

    ``kp`` holds one HyperKernelPack whose array leaves carry a leading
    shard axis [P, ...] (sharded over the mesh's data axis); static fields
    are unified across shards (max window widths / src_pad, identical
    grid). The mesh rides along as static metadata so ops/hyperagg can
    build the shard_map without extra plumbing.
    """
    kp: HyperKernelPack
    mesh: Any = struct.field(pytree_node=False, default=None)
    n_shards: int = struct.field(pytree_node=False, default=1)


def _with_expand_w(ep: ExpandPack, w: int, src_pad: int) -> ExpandPack:
    return ExpandPack(idx=ep.idx, win=ep.win, w=w, src_pad=src_pad)


def build_sharded_hyper_pack(i3: np.ndarray, node_count: int, n_shards: int,
                             mesh: Any, cols: int = 1024
                             ) -> Optional[ShardedHyperPack]:
    """Build per-shard packs over contiguous edge slices (edge order is
    u-sorted, so every contiguous slice stays u-sorted) and stack them.

    i3 length must be divisible by ``n_shards`` (pad_hypergraph_for_mesh
    guarantees it). Returns None when any shard falls back (W_CAP) or the
    per-shard grids disagree (cannot happen for equal slice sizes, checked
    defensively).
    """
    e = i3.shape[0]
    if e == 0 or e % n_shards != 0:
        return None
    es = e // n_shards
    packs = []
    for s in range(n_shards):
        # sigma=False: the sharded bodies slice exact-e edge tails, which
        # the σ relabeling interleaves into rows (see build_hyper_kernel_pack)
        kp = build_hyper_kernel_pack(i3[s * es:(s + 1) * es], node_count,
                                     cols, sigma=False)
        if kp is None:
            return None
        packs.append(kp)

    first = packs[0]
    if any((p.rows, p.cols, p.e, p.k_pad, p.n) !=
           (first.rows, first.cols, first.e, first.k_pad, first.n)
           for p in packs):
        return None

    # unify the static window widths / source padding across shards so the
    # stacked arrays share one static signature
    w_u = max(p.u_expand.w for p in packs)
    w_q = max(p.q.gather.w for p in packs)
    w_i = max(p.i.gather.w for p in packs)
    src_pad = max(max(p.src_pad for p in packs),
                  max(int(np.asarray(p.u_expand.win).max()) + w_u
                      for p in packs),
                  max(int(np.asarray(p.q.gather.win).max()) + w_q
                      for p in packs),
                  max(int(np.asarray(p.i.gather.win).max()) + w_i
                      for p in packs))
    unified = [
        p.replace(
            u_expand=_with_expand_w(p.u_expand, w_u, src_pad),
            q=p.q.replace(gather=_with_expand_w(p.q.gather, w_q, src_pad)),
            i=p.i.replace(gather=_with_expand_w(p.i.gather, w_i, src_pad)),
            src_pad=src_pad,
        )
        for p in packs
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *unified)
    return ShardedHyperPack(kp=stacked, mesh=mesh, n_shards=n_shards)
