"""Hyperedge aggregation ops with custom VJPs — Pallas fast path.

All APIs are **feature-major** ([d, N] node features, [d, E] edge
features): on TPU, arrays with a narrow (32-wide) minor dimension are
lane-padded to 128 — 4-5x wasted HBM and bandwidth — so the big N/E axis
must be the minor axis.

Primitives (SURVEY.md §2.3 kernel contract; the reference runs these
inside torch_sparse/dgl CUDA kernels, /root/reference/Models/GnnLayers.py:233):

* ``gather_roles_t(x_t)``     — [d, N] → 3-tuple (u, q, i) of [d, E_pad]
  endpoint features, each in edge order.
* ``scatter_incidence_t(e_t)``— H·E: [d, E_pad] → [d, N].
* ``spmm_t(x_t)``             — symmetric 2D-adjacency SpMM [d, N] → [d, N].

Fast path (graph.kp — ops/packing.HyperKernelPack): every sparse access is
a composition of three static-layout Pallas kernels —

  windowed one-hot gather  (ops/pallas/gather.py)   role-sorted expansion,
                                                    fused with Clos stage 0
  Clos permutation stages  (ops/pallas/permute.py)  role-rank ↔ edge order
  CSR segment-sum          (ops/pallas/segsum.py)   node-major scatter

Edges are numbered user-sorted (graph.py), so node-major incidence order
is exactly [u-region (identity) | q-rank | i-rank] and the u role needs no
permutation at all. The backward passes reuse the same packed operands in
the opposite direction (gather-bwd = region permute + segment-sum;
scatter-bwd = windowed expansions summed over roles).

The kernel pack enters the custom-vjp functions as an explicit pytree
argument (float0 cotangents): closed-over traced arrays leak out of
``jax.checkpoint``'s inner trace under remat, and baked-in numpy constants
overflow compile payload limits at stress scale.

Dispatch: Pallas when the graph carries a kernel pack, the edge axis is
unmasked, and the backend is TPU; otherwise XLA segment ops (CPU tests,
GSPMD-sharded meshes, log-hypergraphs).
"""

from __future__ import annotations

import contextlib
import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.graph import Graph2D, HyperGraph
from ihgnn_tpu.ops import segment as xla_ops
from ihgnn_tpu.ops.pallas.gather import EXP_RT, windowed_gather, windowed_gather_t
from ihgnn_tpu.ops.pallas.permute import (block_transpose, dg_ok,
                                          int8_rlp_ok,
                                          row_local_permute,
                                          row_local_permute_bfly,
                                          row_local_permute_dg,
                                          row_local_permute_hier,
                                          row_local_permute_int8,
                                          tlp_dg_ok, tlp_hier_ok,
                                          transposed_local_permute_bfly,
                                          transposed_local_permute_dg,
                                          unpack_stage_perm)
from ihgnn_tpu.ops.pallas.segsum import (csr_segment_sum3_t,
                                         csr_segment_sum_t)


def use_pallas(graph) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if isinstance(graph, HyperGraph) or hasattr(graph, "kp"):
        return (getattr(graph, "kp", None) is not None
                and getattr(graph, "edge_mask", None) is None)
    return getattr(graph, "pk_tile_ptr", None) is not None


def strip_kernel_packing(graph):
    """Drop kernel packing so every op dispatches to the XLA fallback —
    the ``--no_pallas`` / RuntimeConfig.use_pallas=False path. Also drops
    the routed word-bag pack (ops/bag.py) so the embedding backward runs
    plain autodiff."""
    fields = [f for f in ("kp", "skp", "pk_col", "pk_val", "pk_ids2d",
                          "pk_tile_ptr", "pk_role", "bag")
              if getattr(graph, f, None) is not None]
    if not fields:
        return graph
    return graph.replace(**{f: None for f in fields})


def _f0(x):
    """float0 cotangent for an integer-dtype primal."""
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _f0_tree(tree):
    return jax.tree.map(_f0, tree)


# ---------------------------------------------------------------------------
# Pallas building blocks (operate on kp sub-structures)
# ---------------------------------------------------------------------------
#
# Each block has a pure-jnp reference twin used when neither a TPU backend
# nor Mosaic interpret mode is active (plain-CPU tests of the *pipeline* —
# pack construction, shard_map plumbing, custom VJPs). The Mosaic
# interpreter itself deadlocks when several CPU mesh devices run kernels
# concurrently under shard_map (io_callback buffer allocation), so sharded
# CPU tests must run the reference twins; Mosaic-level kernel parity is
# covered by the single-chip interpret tests + tools/kernel_check.py.


_IMPL_PLATFORM = threading.local()


@contextlib.contextmanager
def _impl_platform(platform: str):
    """Trace-time override of the dispatch platform — the sharded impls
    set it to the *mesh's* device platform, which can differ from the
    default backend (e.g. a CPU-device dryrun mesh under a TPU backend)."""
    prev = getattr(_IMPL_PLATFORM, "value", None)
    _IMPL_PLATFORM.value = platform
    try:
        yield
    finally:
        _IMPL_PLATFORM.value = prev


def _kernels_active() -> bool:
    plat = getattr(_IMPL_PLATFORM, "value", None) or jax.default_backend()
    if plat == "tpu":
        return True
    from jax._src import config as _jcfg
    return (_jcfg.pallas_tpu_interpret_mode_context_manager.value
            is not None)


def _expand(x_pad, ep):
    """Windowed expansion: [d, src_pad] → [d, R*C]."""
    if not _kernels_active():
        r, nch, ch = ep.idx.shape
        idx_abs = (ep.idx.reshape(r, nch * ch)
                   + ep.win[:, None]).reshape(-1)
        return jnp.take(x_pad, idx_abs, axis=1)
    return windowed_gather(x_pad, ep.idx, ep.win, ep.w)


def _bt(x):
    """Block transpose [d, R, C] → [d, C, R]."""
    if not _kernels_active():
        return jnp.swapaxes(x, 1, 2)
    return block_transpose(x)


def _expand_t(x_pad, ep, rows, cols):
    """Fused transpose(expand): [d, src_pad] → [d, C, R] — one kernel, no
    intermediate HBM round-trip (hyperagg._role_forward's first two steps)."""
    if not _kernels_active():
        d = x_pad.shape[0]
        return jnp.swapaxes(_expand(x_pad, ep).reshape(d, rows, cols), 1, 2)
    return windowed_gather_t(x_pad, ep.idx, ep.win, ep.w)


def _rlp(x, st):
    """Row-local permute (StageTable): out[:, r, c] = x[:, r, p[r, c]].
    dg tables run the dynamic-gather kernel (round-4 default; one-hot
    hier fallback when the shape/dtype falls outside dg_ok); bfly the
    pure-VPU roll+select kernel; hier the two-level one-hot kernel; flat
    the full-depth one-hot kernel."""
    if not _kernels_active():
        p = unpack_stage_perm(st)
        return jnp.take_along_axis(x, jnp.broadcast_to(p[None], x.shape),
                                   axis=2)
    if st.kind == "dg":
        if dg_ok(*x.shape, x.dtype):
            return row_local_permute_dg(x, st.tab)
        return row_local_permute_hier(x, st.tab, w=st.w)
    if st.kind == "bfly":
        return row_local_permute_bfly(x, st.tab)
    if st.kind == "hier":
        return row_local_permute_hier(x, st.tab, w=st.w)
    if int8_rlp_ok(*x.shape, x.dtype):
        # long-row flat stage: exact int8 byte-plane one-hot (2x MXU rate,
        # full M packing — 26 vs 47 ms/pass at the 10M-edge stress shape)
        return row_local_permute_int8(x, st.tab)
    return row_local_permute(x, st.tab)


def _rlp_bt(x, st):
    """block_transpose(_rlp(x, st)) — fused into one HBM pass for bfly
    tables (transposed_local_permute_bfly).

    Fused one-hot variants LOSE to the two-kernel pair (amortized
    on-chip, 2M x 32: flat TLP 21.0 vs 4.9 ms/pair f32; hier TLP 8.5 vs
    3.3 — the per-row MXU loops defeat Mosaic's pipelining), so hier and
    flat tables dispatch to the pair. The butterfly kernel is full-block
    vector code with no row loops, which is what makes its fusion
    profitable."""
    if not _kernels_active():
        p = unpack_stage_perm(st)
        y = jnp.take_along_axis(x, jnp.broadcast_to(p[None], x.shape),
                                axis=2)
        return jnp.swapaxes(y, 1, 2)
    if st.kind == "dg" and tlp_dg_ok(*x.shape, x.dtype):
        # fused dg permute+transpose: profitable because the dg body has
        # no per-row MXU issues to serialize (3.39 vs 2.84 + 1.18 f32 at
        # the bench stage shape — docs/DG2_PROBE.json)
        return transposed_local_permute_dg(x, st.tab)
    if st.kind == "bfly" and tlp_hier_ok(*x.shape, x.dtype):
        return transposed_local_permute_bfly(x, st.tab)
    return block_transpose(_rlp(x, st))


def _role_forward(x_pad, rp, rows, cols, stop_pre_p2: bool = False):
    """Role features in edge order (σ order when rp.fwd_p2 is None — the
    q role of a σ pack): (expand∘stage0, transposed) fused, then (p1·T)
    fused, then p2 — 3 kernels, each one HBM round-trip (2 for σ-q).
    ``stop_pre_p2``: return the pre-final-stage ("t1") state — the
    absorbed-interaction contract (interact.py applies p2 in-kernel)."""
    d = x_pad.shape[0]
    ep = rp.gather
    # the fused kernel transposes the EXPAND grid, which matches the stage
    # grid only when the packer's EXPAND_COLS row width equals cols (true
    # at bench scale; small graphs pack the expansion wider than the grid);
    # wide windows fall back (128 live windows must fit scoped VMEM)
    from ihgnn_tpu.ops.pallas.gather import exp_t_vmem_ok
    if (ep.idx.shape[0] == rows and ep.idx.shape[1] * 128 == cols
            and rows % EXP_RT == 0
            and exp_t_vmem_ok(d, ep.w, x_pad.dtype)):
        t0 = _expand_t(x_pad, ep, rows, cols)
    else:
        t0 = _bt(_expand(x_pad, ep).reshape(d, rows, cols))
    t1 = _rlp_bt(t0, rp.fwd_p1)
    if rp.fwd_p2 is None or stop_pre_p2:        # σ q role: stop at t1
        return t1.reshape(d, rows * cols)
    out = _rlp(t1, rp.fwd_p2)
    return out.reshape(d, rows * cols)


def _permute_to_t1(y, rp, rows, cols):
    """Edge order → pre-stage-2 ("t1") role-rank order ([d, E_pad]). The
    final Clos stage is absorbed into the segment-sum ids (packing.py), so
    only (p0·T fused) · (p1·T fused) run on device — 2 HBM passes.
    Non-σ packs only."""
    d = y.shape[0]
    t0 = _rlp_bt(y.reshape(d, rows, cols), rp.bwd_p0)
    t1 = _rlp_bt(t0, rp.bwd_p1)
    return t1.reshape(d, rows * cols)


def _sig_inverse(y, rp, rows, cols, from_pre: bool = False):
    """σ order → stage-0 rank order ([d, E_pad]): [inv_p2 (i role only)]
    · T · inv_p1 · T; the trailing stage-0⁻¹ is absorbed into the
    segment-sum ids (packing.py σ layout). σ packs only.
    ``from_pre``: the input already has inv_p2 applied (the absorbed
    interaction emitted it — interact.py o2), so skip that stage."""
    d = y.shape[0]
    g = y.reshape(d, rows, cols)
    if rp.inv_p2 is None or from_pre:
        # no leading permute: the bt + tlp(inv_p1) pair collapses into ONE
        # HBM round trip (transposed-input DMA + in-VMEM transpose,
        # permute.py _tlp_dg_pre_kernel) when the dg kernel covers it
        from ihgnn_tpu.ops.pallas.permute import (
            tlp_dg_pre_ok, transposed_local_permute_dg_pre)
        if (_kernels_active() and rp.inv_p1.kind == "dg"
                and os.environ.get("IHGNN_TLP_PRE", "1") == "1"
                and tlp_dg_pre_ok(d, rows, cols, y.dtype)):
            out = transposed_local_permute_dg_pre(g, rp.inv_p1.tab)
            return out.reshape(d, rows * cols)
        gt = _bt(g)
    else:
        # inv_p2 (i role) fuses with the following transpose: _rlp_bt(g,
        # p2) == _bt(_rlp(g, p2)), one HBM pass instead of two (tlp_dg)
        gt = _rlp_bt(g, rp.inv_p2)
    out = _rlp_bt(gt, rp.inv_p1)                # [d, C, R] → [d, R, C]
    return out.reshape(d, rows * cols)


def _to_rank_blocks(y, rp, rows, cols, sigma):
    return (_sig_inverse(y, rp, rows, cols) if sigma
            else _permute_to_t1(y, rp, rows, cols))


def sigma_to_edge_order(edge_t, kp):
    """Re-label a σ-ordered edge stream into TRUE edge order (the q-role's
    final Clos stage) — for consumers indexing edges by id (phase-2
    attention over the incidence). Chunk concat IS global edge order
    (chunks are contiguous edge slices)."""
    if not getattr(kp, "sigma", False):
        return edge_t
    if _is_chunked(kp):
        return jnp.concatenate(
            [sigma_to_edge_order(sl, pk)
             for pk, sl in zip(kp.packs, _chunk_slices(edge_t, kp))],
            axis=1)
    d = edge_t.shape[0]
    out = _rlp(edge_t.reshape(d, kp.rows, kp.cols), kp.sig_stage)
    return out.reshape(d, kp.rows * kp.cols)


def _segsum_regions(region_u, region_q_t1, region_i_t1, kp):
    """Segment-sum of the incidence values (full-width [d, E_pad] regions;
    q/i in t1 order, pad tails dropped via sentinel ids) → [d, N] f32
    (accumulation is always f32, even for bf16 value streams).

    The kernel path takes the three regions as separate refs
    (csr_segment_sum3_t) — materializing the [d, 3E] concat costs a full
    extra HBM round-trip per call, ~1 ms x 4 calls/step at the bench."""
    if not _kernels_active():
        vals = jnp.concatenate([region_u, region_q_t1, region_i_t1], axis=1)
        ids = kp.ids2d.reshape(-1)
        valid = ids < kp.n
        # mirror the kernel's accumulate-in-f32 contract for bf16 streams
        vals_m = jnp.where(valid[None, :], vals, 0).astype(jnp.float32)
        ids_c = jnp.where(valid, ids, 0)
        return jax.ops.segment_sum(vals_m.T, ids_c, num_segments=kp.n).T
    return csr_segment_sum3_t(region_u, region_q_t1, region_i_t1,
                              kp.ids2d, kp.tile_ptr, kp.n,
                              out_transposed=True,
                              block=getattr(kp, "seg_block", 1024))


def _is_chunked(kp) -> bool:
    from ihgnn_tpu.ops.packing import ChunkedHyperPack
    return isinstance(kp, ChunkedHyperPack)


def _segsum_chunked(vu_full, rqs, ris, kp):
    """All chunks' [u | q | i] regions → ONE [d, N] f32 sum.

    Kernel path: csr_segment_sum3_multi — one node-tile sweep for every
    chunk instead of K sweeps + K-1 [d, N] partial add passes (the
    round-4 chunked form cost ~5.5 ms of per-tile overhead and a 450 MB
    partial write per EXTRA chunk per call at the 10M-edge stress shape,
    docs/STRESS_ACCOUNTING_r05.json). ``vu_full`` is the full
    concatenated edge/cotangent stream; u regions are read at static
    chunk offsets."""
    from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum3_multi
    if not _kernels_active():
        total, off = None, 0
        for pk, rq, ri in zip(kp.packs, rqs, ris):
            part = _segsum_regions(vu_full[:, off:off + pk.e_pad], rq, ri,
                                   pk)
            total = part if total is None else total + part
            off += pk.e_pad
        return total
    offs, off = [], 0
    for pk in kp.packs:
        offs.append(off)
        off += pk.e_pad
    tptr = jnp.stack([pk.tile_ptr for pk in kp.packs])
    return csr_segment_sum3_multi(
        vu_full, tuple(rqs), tuple(ris),
        tuple(pk.ids2d for pk in kp.packs), tptr, kp.n,
        blocks=tuple(getattr(pk, "seg_block", 1024) for pk in kp.packs),
        u_offs=tuple(offs), out_transposed=True)


def _chunk_slices(edge_t, kp):
    """Split a [d, e_pad_total] stream into the per-chunk [d, e_pad_k]
    slices (chunks are contiguous in the concat)."""
    out, off = [], 0
    for pk in kp.packs:
        out.append(edge_t[:, off:off + pk.e_pad])
        off += pk.e_pad
    return out


def _gather_impl(x_pad, kp):
    if _is_chunked(kp):
        us, qs, ii = [], [], []
        for pk in kp.packs:
            us.append(_expand(x_pad, pk.u_expand))
            qs.append(_role_forward(x_pad, pk.q, pk.rows, pk.cols))
            ii.append(_role_forward(x_pad, pk.i, pk.rows, pk.cols))
        return (jnp.concatenate(us, axis=1), jnp.concatenate(qs, axis=1),
                jnp.concatenate(ii, axis=1))
    u = _expand(x_pad, kp.u_expand)
    q = _role_forward(x_pad, kp.q, kp.rows, kp.cols)
    i = _role_forward(x_pad, kp.i, kp.rows, kp.cols)
    return u, q, i


def _scatter_impl(edge_t, kp):
    if _is_chunked(kp):
        rqs, ris = [], []
        for pk, sl in zip(kp.packs, _chunk_slices(edge_t, kp)):
            rqs.append(_to_rank_blocks(sl, pk.q, pk.rows, pk.cols,
                                       pk.sigma))
            ris.append(_to_rank_blocks(sl, pk.i, pk.rows, pk.cols,
                                       pk.sigma))
        return _segsum_chunked(edge_t, rqs, ris, kp)
    region_q = _to_rank_blocks(edge_t, kp.q, kp.rows, kp.cols, kp.sigma)
    region_i = _to_rank_blocks(edge_t, kp.i, kp.rows, kp.cols, kp.sigma)
    return _segsum_regions(edge_t, region_q, region_i, kp)


# ---------------------------------------------------------------------------
# custom-vjp primitives (Pallas path)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_roles_pallas(x_pad, kp):
    return _gather_impl(x_pad, kp)


def _gather_fwd(x_pad, kp):
    return _gather_impl(x_pad, kp), kp


def _gather_bwd(kp, cot):
    cu, cq, ci = cot
    if _is_chunked(kp):
        rqs, ris = [], []
        for pk, sq, si in zip(kp.packs, _chunk_slices(cq, kp),
                              _chunk_slices(ci, kp)):
            rqs.append(_to_rank_blocks(sq, pk.q, pk.rows, pk.cols,
                                       pk.sigma))
            ris.append(_to_rank_blocks(si, pk.i, pk.rows, pk.cols,
                                       pk.sigma))
        grad = _segsum_chunked(cu, rqs, ris, kp)
    else:
        cot_q = _to_rank_blocks(cq, kp.q, kp.rows, kp.cols, kp.sigma)
        cot_i = _to_rank_blocks(ci, kp.i, kp.rows, kp.cols, kp.sigma)
        grad = _segsum_regions(cu, cot_q, cot_i, kp)    # f32 accumulation
    # gather is dtype-preserving, so the primal x_pad dtype == cot dtype
    grad = jnp.pad(grad.astype(cu.dtype), ((0, 0), (0, kp.src_pad - kp.n)))
    return grad, _f0_tree(kp)


_gather_roles_pallas.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def _scatter_pallas(edge_t, kp):
    return _scatter_impl(edge_t, kp)


def _scatter_fwd(edge_t, kp):
    # scatter always outputs f32 (accumulation), so the edge-stream dtype
    # can't be recovered from the cotangent — carry a zero-size token
    return _scatter_impl(edge_t, kp), (kp, jnp.zeros((0,), edge_t.dtype))


def _scatter_grad_one(cot_pad, kp):
    """Edge-stream gradient of one pack's scatter: the three role
    expansions of the node cotangent, σ-pad leakage masked."""
    grad = (_expand(cot_pad, kp.u_expand)
            + _role_forward(cot_pad, kp.q, kp.rows, kp.cols)
            + _role_forward(cot_pad, kp.i, kp.rows, kp.cols))
    if kp.e_pad != kp.e:
        if kp.sigma:
            grad = grad * kp.sig_mask.astype(grad.dtype)
        else:
            d = grad.shape[0]
            grad = jnp.concatenate(
                [grad[:, :kp.e],
                 jnp.zeros((d, kp.e_pad - kp.e), grad.dtype)], axis=1)
    return grad


def _scatter_bwd(res, cot):
    kp, e_token = res
    # run the backward expansion in the edge-stream dtype (the cotangent
    # arrives f32 from the segsum side; for bf16 streams the gradient
    # stream is bf16, standard mixed-precision practice)
    cot_pad = jnp.pad(cot.astype(e_token.dtype),
                      ((0, 0), (0, kp.src_pad - kp.n)))
    if _is_chunked(kp):
        grad = jnp.concatenate(
            [_scatter_grad_one(cot_pad, pk) for pk in kp.packs], axis=1)
        return grad, _f0_tree(kp)
    grad = (_expand(cot_pad, kp.u_expand)
            + _role_forward(cot_pad, kp.q, kp.rows, kp.cols)
            + _role_forward(cot_pad, kp.i, kp.rows, kp.cols))
    if kp.e_pad != kp.e:
        # padding positions are not edges: their expansion values are
        # repeats of real node cotangents and must not leak into the
        # edge-feature gradient (they would pollute interactor weight
        # grads through the full-width matmuls). σ packs interleave pads
        # within rows, so the zeroing is a mask, not a tail slice.
        if kp.sigma:
            grad = grad * kp.sig_mask.astype(grad.dtype)
        else:
            d = grad.shape[0]
            grad = jnp.concatenate(
                [grad[:, :kp.e],
                 jnp.zeros((d, kp.e_pad - kp.e), grad.dtype)], axis=1)
    return grad, _f0_tree(kp)


_scatter_pallas.defvjp(_scatter_fwd, _scatter_bwd)


# ---------------------------------------------------------------------------
# absorbed-interaction variants (round 4): the i role's final Clos stage
# π = fwd_p2 and its inverse ρ = inv_p2 run INSIDE the fused interaction
# kernel (ops/pallas/interact.py absorb kernels), so:
#   gather returns i in pre-p2 ("t1") order (one fewer rlp pass) and its
#   backward consumes a t1-ordered cotangent (one fewer inv_p2 pass);
#   scatter takes (edge_t, pre_i = ρ(edge_t) emitted by the interaction)
#   so its i chain starts at _bt like the q chain (one fewer pass), and
#   its backward emits the i-role expansion pre-p2 (one fewer pass).
# Four [d, E] HBM permute passes per layer fwd+bwd replaced by in-VMEM
# dynamic gathers. σ-pad cotangent zeroing moves into the absorbed
# interaction backward (it masks the MERGED cotangent).
# ---------------------------------------------------------------------------


def absorb_i_ok(kp, d: int, dtype) -> bool:
    """Static gate: σ pack with dg-packed i-role final stages whose rows
    nest inside the interaction kernel's blocks. Chunked packs qualify
    when every chunk does — the per-chunk p2 tables concatenate along the
    row axis into one table (all chunks share cols, so block/row nesting
    is unchanged; see absorb_tables)."""
    import os
    if kp is None or not getattr(kp, "sigma", False):
        return False
    if os.environ.get("IHGNN_ABSORB_I", "1") != "1":
        return False
    from ihgnn_tpu.ops.pallas.interact import absorb_blk_ok
    if _is_chunked(kp):
        total_rows = 0
        for pk in kp.packs:
            pi, rho = pk.i.fwd_p2, pk.i.inv_p2
            if (pi is None or rho is None or pi.kind != "dg"
                    or rho.kind != "dg"):
                return False
            total_rows += pk.rows
        return absorb_blk_ok(kp.e_pad, total_rows, kp.cols, d, dtype)
    pi, rho = kp.i.fwd_p2, kp.i.inv_p2
    if pi is None or rho is None or pi.kind != "dg" or rho.kind != "dg":
        return False
    return absorb_blk_ok(kp.e_pad, kp.rows, kp.cols, d, dtype)


def absorb_tables(kp):
    """(fwd_p2 tab, inv_p2 tab, sig_mask, cols) for the absorbed
    interaction — per-chunk tables concatenated for ChunkedHyperPack
    (row-axis concat; sig_mask gaps filled with ones)."""
    if not _is_chunked(kp):
        return (kp.i.fwd_p2.tab, kp.i.inv_p2.tab, kp.sig_mask, kp.cols)
    pi = jnp.concatenate([pk.i.fwd_p2.tab for pk in kp.packs], axis=0)
    rho = jnp.concatenate([pk.i.inv_p2.tab for pk in kp.packs], axis=0)
    if all(pk.sig_mask is None for pk in kp.packs):
        mask = None
    else:
        mask = jnp.concatenate(
            [pk.sig_mask if pk.sig_mask is not None
             else jnp.ones((1, pk.e_pad), jnp.float32) for pk in kp.packs],
            axis=1)
    return pi, rho, mask, kp.cols


def _gather_pre_impl(x_pad, kp):
    if _is_chunked(kp):
        us, qs, ii = [], [], []
        for pk in kp.packs:
            us.append(_expand(x_pad, pk.u_expand))
            qs.append(_role_forward(x_pad, pk.q, pk.rows, pk.cols))
            ii.append(_role_forward(x_pad, pk.i, pk.rows, pk.cols,
                                    stop_pre_p2=True))
        return (jnp.concatenate(us, axis=1), jnp.concatenate(qs, axis=1),
                jnp.concatenate(ii, axis=1))
    u = _expand(x_pad, kp.u_expand)
    q = _role_forward(x_pad, kp.q, kp.rows, kp.cols)
    i = _role_forward(x_pad, kp.i, kp.rows, kp.cols, stop_pre_p2=True)
    return u, q, i


@jax.custom_vjp
def _gather_pre_pallas(x_pad, kp):
    return _gather_pre_impl(x_pad, kp)


def _gather_pre_fwd(x_pad, kp):
    return _gather_pre_impl(x_pad, kp), kp


def _gather_pre_bwd(kp, cot):
    cu, cq, ci = cot                 # ci arrives t1-ordered
    if _is_chunked(kp):
        rqs, ris = [], []
        for pk, sq, si in zip(kp.packs, _chunk_slices(cq, kp),
                              _chunk_slices(ci, kp)):
            rqs.append(_sig_inverse(sq, pk.q, pk.rows, pk.cols))
            ris.append(_sig_inverse(si, pk.i, pk.rows, pk.cols,
                                    from_pre=True))
        grad = _segsum_chunked(cu, rqs, ris, kp)
    else:
        cot_q = _sig_inverse(cq, kp.q, kp.rows, kp.cols)
        cot_i = _sig_inverse(ci, kp.i, kp.rows, kp.cols, from_pre=True)
        grad = _segsum_regions(cu, cot_q, cot_i, kp)
    grad = jnp.pad(grad.astype(cu.dtype), ((0, 0), (0, kp.src_pad - kp.n)))
    return grad, _f0_tree(kp)


_gather_pre_pallas.defvjp(_gather_pre_fwd, _gather_pre_bwd)


def _scatter2_impl(edge_t, pre_i, kp):
    if _is_chunked(kp):
        rqs, ris = [], []
        for pk, se, sp in zip(kp.packs, _chunk_slices(edge_t, kp),
                              _chunk_slices(pre_i, kp)):
            rqs.append(_sig_inverse(se, pk.q, pk.rows, pk.cols))
            ris.append(_sig_inverse(sp, pk.i, pk.rows, pk.cols,
                                    from_pre=True))
        return _segsum_chunked(edge_t, rqs, ris, kp)
    region_q = _sig_inverse(edge_t, kp.q, kp.rows, kp.cols)
    region_i = _sig_inverse(pre_i, kp.i, kp.rows, kp.cols, from_pre=True)
    return _segsum_regions(edge_t, region_q, region_i, kp)


@jax.custom_vjp
def _scatter2_pallas(edge_t, pre_i, kp):
    return _scatter2_impl(edge_t, pre_i, kp)


def _scatter2_fwd(edge_t, pre_i, kp):
    return (_scatter2_impl(edge_t, pre_i, kp),
            (kp, jnp.zeros((0,), edge_t.dtype)))


def _scatter2_bwd(res, cot):
    kp, e_token = res
    cot_pad = jnp.pad(cot.astype(e_token.dtype),
                      ((0, 0), (0, kp.src_pad - kp.n)))
    # σ-pad expansion junk is zeroed on the MERGED cotangent inside the
    # absorbed interaction backward (interact.py masks c1 + π(c2) with
    # the sig_mask), so neither stream needs masking here.
    if _is_chunked(kp):
        grad_e = jnp.concatenate(
            [_expand(cot_pad, pk.u_expand)
             + _role_forward(cot_pad, pk.q, pk.rows, pk.cols)
             for pk in kp.packs], axis=1)
        grad_pre = jnp.concatenate(
            [_role_forward(cot_pad, pk.i, pk.rows, pk.cols,
                           stop_pre_p2=True) for pk in kp.packs], axis=1)
        return grad_e, grad_pre, _f0_tree(kp)
    grad_e = (_expand(cot_pad, kp.u_expand)
              + _role_forward(cot_pad, kp.q, kp.rows, kp.cols))
    grad_pre = _role_forward(cot_pad, kp.i, kp.rows, kp.cols,
                             stop_pre_p2=True)
    return grad_e, grad_pre, _f0_tree(kp)


_scatter2_pallas.defvjp(_scatter2_fwd, _scatter2_bwd)


# ---------------------------------------------------------------------------
# sharded primitives (shard_map over the mesh data axis, per-shard packs)
# ---------------------------------------------------------------------------
#
# The custom VJP sits OUTSIDE the shard_map: fwd/bwd each wrap the
# non-differentiated per-shard Pallas impls, so autodiff never traverses
# the manual-mesh region. Per-shard layout: each shard owns a contiguous
# slice of the (u-sorted) edge axis — still u-sorted, so the per-shard
# packs follow the exact single-chip construction.
#
# Node-partial combining is NODE-SHARDED (BASELINE.json north star:
# "psum_scatter for incidence-aggregation partials"): every scatter-like
# body reduce-scatters its [d, N] partial over the data axis
# (``lax.psum_scatter``, node axis padded to a lane-aligned multiple of
# the axis size) and emits out_specs P(None, data) — each device keeps
# only its [d, N/P] node block, so per-device node memory and collective
# payload stop scaling with the full node count. Per-node work between
# layers (Dv^-1 scale, feature transform, remat) then runs on the
# node-sharded array under GSPMD; the next gather-like body declares its
# node input replicated (in_specs P()), which makes GSPMD materialize the
# one all-gather the expansion windows actually need. Comm per call is
# one reduce-scatter + one all-gather = exactly one all-reduce — the same
# bytes as the old full-matrix psum — but the replicated [d, N] array
# (≈450 MB at the 100M-edge stress config) never exists outside the
# collective, and the all-gather can later shrink to the window ranges
# the packs touch (docs/PARALLELISM.md).


def _kp_local(kp_stacked):
    """Strip the leading shard axis a shard_map body sees ([1, ...])."""
    return jax.tree.map(lambda a: a[0], kp_stacked)


def _sharded_specs(skp):
    from jax.sharding import PartitionSpec as P

    from ihgnn_tpu.parallel.mesh import DATA_AXIS
    mesh = skp.mesh
    platform = mesh.devices.flat[0].platform
    return P, DATA_AXIS, mesh, platform


def _node_pad(n: int, n_shards: int) -> int:
    """Node-axis length for reduce-scattered outputs: a multiple of the
    data-axis size, 128-aligned per shard so GSPMD shard boundaries never
    split a lane tile."""
    block = 128 * n_shards
    return -(-max(n, 1) // block) * block


def _bf16_rs_on() -> bool:
    """bf16 node-partial combining (round 5, docs/PARALLELISM.md): the
    node-partial collectives dominate multi-chip comm (class 1 in the
    SCALING artifacts). When the edge streams are already bf16, rounding
    THE PARTIALS to bf16 for the wire costs one extra bf16 rounding per
    cross-shard reduction — the same precision class as the stream
    rounding itself.

    Form (measured from real v5e-8 AOT-compiled HLO, SCALING_r05.json):
    this toolchain lowers a bf16 ``psum_scatter`` as a full all-reduce +
    slice, so RS+AG costs 2x AR on the wire. The winning formulation is
    therefore ONE bf16 ``psum`` with a REPLICATED result: the downstream
    all-gather disappears entirely, and per layer direction the
    node-combining wire drops from f32-RS + bf16-AG (= 3 bf16-units x
    (P-1)/P) to a bf16 AR (= 2 units) — the ~33% class-1 cut the
    100M-edge plan needs to clear 80% efficiency. Per-device memory for
    the replicated bf16 [d, N] result at the 100M stress shape is
    2.24 GB (budgeted in docs/PARALLELISM.md). Off via IHGNN_BF16_RS=0
    (f32 reduce-scatter + bf16 all-gather, node-sharded results)."""
    return os.environ.get("IHGNN_BF16_RS", "1") == "1"


def _rs_node_partial(partial, n_pad: int, data):
    """Reduce-scatter a per-shard [d, n] node partial into this device's
    [d, n_pad / P] node block. f32 partials ride the wire as bf16 when
    the stream dtype is bf16 and IHGNN_BF16_RS is on (see _bf16_rs_on);
    the result is returned f32 either way."""
    d, n = partial.shape
    padded = jnp.pad(partial, ((0, 0), (0, n_pad - n)))
    out = jax.lax.psum_scatter(padded, data, scatter_dimension=1,
                               tiled=True)
    return out




def _sh_gather_impl(x_t, skp):
    P, data, mesh, plat = _sharded_specs(skp)

    def body(x_full, kp_st):
        kp = _kp_local(kp_st)
        x_pad = jnp.pad(x_full, ((0, 0), (0, kp.src_pad - kp.n)))
        u, q, i = _gather_impl(x_pad, kp)
        return u[:, :kp.e], q[:, :kp.e], i[:, :kp.e]    # 3 x [d, e_shard]

    with _impl_platform(plat):
        # in_specs P() on the node-sharded x_t makes GSPMD insert the one
        # all-gather the expansion windows need (the RS+AG pair per layer
        # costs the same bytes as the old full-matrix all-reduce)
        return jax.shard_map(body, mesh=mesh, in_specs=(P(), P(data)),
                             out_specs=(P(None, data),) * 3,
                             check_vma=False)(x_t, skp.kp)


def _sh_scatter_impl(edge_t, skp):
    P, data, mesh, plat = _sharded_specs(skp)
    n_pad = _node_pad(skp.kp.n, skp.n_shards)

    bf16_wire = edge_t.dtype == jnp.bfloat16 and _bf16_rs_on()

    if bf16_wire:
        # single bf16 psum, replicated result (see _bf16_rs_on): no
        # downstream all-gather; f32 restored outside the collective
        def body(e_loc, kp_st):
            kp = _kp_local(kp_st)
            e_pad = jnp.pad(e_loc, ((0, 0), (0, kp.e_pad - kp.e)))
            part = _scatter_impl(e_pad, kp).astype(jnp.bfloat16)
            return jax.lax.psum(part, data)

        with _impl_platform(plat):
            out = jax.shard_map(body, mesh=mesh,
                                in_specs=(P(None, data), P(data)),
                                out_specs=P(),
                                check_vma=False)(edge_t, skp.kp)
        return out[:, :skp.kp.n].astype(jnp.float32)    # replicated

    def body(e_loc, kp_st):
        kp = _kp_local(kp_st)
        e_pad = jnp.pad(e_loc, ((0, 0), (0, kp.e_pad - kp.e)))
        return _rs_node_partial(_scatter_impl(e_pad, kp), n_pad, data)

    with _impl_platform(plat):
        out = jax.shard_map(body, mesh=mesh,
                            in_specs=(P(None, data), P(data)),
                            out_specs=P(None, data),
                            check_vma=False)(edge_t, skp.kp)
    return out[:, :skp.kp.n]                            # node-sharded


@jax.custom_vjp
def _gather_roles_sharded(x_t, skp):
    return _sh_gather_impl(x_t, skp)


def _sh_gather_fwd(x_t, skp):
    return _sh_gather_impl(x_t, skp), skp


def _sh_gather_bwd(skp, cot):
    P, data, mesh, plat = _sharded_specs(skp)
    n_pad = _node_pad(skp.kp.n, skp.n_shards)
    bf16_wire = cot[0].dtype == jnp.bfloat16 and _bf16_rs_on()

    def body(cot_loc, kp_st):                           # 3 x [d, e_shard]
        kp = _kp_local(kp_st)
        cu, cq, ci = (jnp.pad(c, ((0, 0), (0, kp.e_pad - kp.e)))
                      for c in cot_loc)
        cot_q = _permute_to_t1(cq, kp.q, kp.rows, kp.cols)
        cot_i = _permute_to_t1(ci, kp.i, kp.rows, kp.cols)
        grad = _segsum_regions(cu, cot_q, cot_i, kp)    # f32 accumulation
        # gather is dtype-preserving: primal x_t dtype == cot dtype
        if bf16_wire:
            # one bf16 psum, replicated grad (see _bf16_rs_on)
            return jax.lax.psum(grad.astype(cu.dtype), data)
        return _rs_node_partial(grad.astype(cu.dtype), n_pad, data)

    with _impl_platform(plat):
        grad = jax.shard_map(body, mesh=mesh,
                             in_specs=(((P(None, data),) * 3), P(data)),
                             out_specs=P() if bf16_wire else P(None, data),
                             check_vma=False)(cot, skp.kp)
    return grad[:, :skp.kp.n], _f0_tree(skp)


_gather_roles_sharded.defvjp(_sh_gather_fwd, _sh_gather_bwd)


@jax.custom_vjp
def _scatter_sharded(edge_t, skp):
    return _sh_scatter_impl(edge_t, skp)


def _sh_scatter_fwd(edge_t, skp):
    return (_sh_scatter_impl(edge_t, skp),
            (skp, jnp.zeros((0,), edge_t.dtype)))


def _sh_scatter_bwd(res, cot):
    skp, e_token = res
    P, data, mesh, plat = _sharded_specs(skp)
    e_dtype = e_token.dtype
    # cast the node cotangent to the stream dtype BEFORE the shard_map so
    # any in_specs P() all-gather moves bf16, not f32 (GSPMD otherwise
    # hoists the convert past the collective). Only the f32-RS path pins
    # it node-sharded — under the bf16-psum formulation the cotangent is
    # already replicated and a node-sharded pin would force a slice +
    # re-gather round trip (observed in the v5e-8 AOT HLO).
    if e_dtype != cot.dtype:
        from jax.sharding import NamedSharding

        spec = P() if _bf16_rs_on() else P(None, data)
        cot = jax.lax.with_sharding_constraint(
            cot.astype(e_dtype), NamedSharding(mesh, spec))

    def body(cot_n, kp_st):
        kp = _kp_local(kp_st)
        cot_pad = jnp.pad(cot_n.astype(e_dtype),
                          ((0, 0), (0, kp.src_pad - kp.n)))
        grad = (_expand(cot_pad, kp.u_expand)
                + _role_forward(cot_pad, kp.q, kp.rows, kp.cols)
                + _role_forward(cot_pad, kp.i, kp.rows, kp.cols))
        return grad[:, :kp.e]

    with _impl_platform(plat):
        # cot is node-sharded (scatter's output spec); in_specs P() makes
        # GSPMD all-gather it once for the per-shard expansions
        grad = jax.shard_map(body, mesh=mesh, in_specs=(P(), P(data)),
                             out_specs=P(None, data), check_vma=False)(
                                 cot, skp.kp)
    return grad, _f0_tree(skp)


_scatter_sharded.defvjp(_sh_scatter_fwd, _sh_scatter_bwd)


# --- batch-restricted sharded scatter (round 5, docs/PARALLELISM.md
# "tail psum"): the LAST GNN layer's output is consumed only at the
# training batch's node rows (RawGnn.score), so combining its full [d, N]
# node partial across shards wastes a whole class-1 collective — at the
# 100M-edge plan shape that is one of four ~3.9 GB-wire all-reduces per
# step. This op reduces ONLY the batch node columns: per shard the full
# partial is still computed (same kernels), but the cross-shard psum
# moves [d, 3*B(1+K)] ≈ 2 MB instead of [d, 35M].


def _sh_scatter_at_impl(edge_t, nodes, skp):
    P, data, mesh, plat = _sharded_specs(skp)

    def body(e_loc, nodes_r, kp_st):
        kp = _kp_local(kp_st)
        e_pad = jnp.pad(e_loc, ((0, 0), (0, kp.e_pad - kp.e)))
        partial = _scatter_impl(e_pad, kp)          # [d, n] f32
        sel = jnp.take(partial, nodes_r, axis=1)    # [d, K]
        return jax.lax.psum(sel, data)

    with _impl_platform(plat):
        return jax.shard_map(body, mesh=mesh,
                             in_specs=(P(None, data), P(), P(data)),
                             out_specs=P(),
                             check_vma=False)(edge_t, nodes, skp.kp)


@jax.custom_vjp
def _scatter_at_sharded(edge_t, nodes, skp):
    return _sh_scatter_at_impl(edge_t, nodes, skp)


def _sh_scatter_at_fwd(edge_t, nodes, skp):
    return (_sh_scatter_at_impl(edge_t, nodes, skp),
            (nodes, skp, jnp.zeros((0,), edge_t.dtype)))


def _sh_scatter_at_bwd(res, cot):
    nodes, skp, e_token = res
    # rebuild the sparse full-width cotangent (replicated — every shard
    # computes it identically from the replicated batch cotangent; batch
    # nodes repeat, so scatter-ADD) and reuse the plain scatter backward
    d = cot.shape[0]
    full = jnp.zeros((d, skp.kp.n), jnp.float32).at[:, nodes].add(cot)
    grad, _ = _sh_scatter_bwd((skp, e_token), full)
    return grad, _f0(nodes), _f0_tree(skp)


_scatter_at_sharded.defvjp(_sh_scatter_at_fwd, _sh_scatter_at_bwd)


def scatter_incidence_rows_t(graph, edge_t, nodes):
    """Sharded H·E restricted to ``nodes`` columns: [d, E'] → [d, K]
    (see _scatter_at_sharded). Only valid when graph.skp is set."""
    return _scatter_at_sharded(edge_t, nodes, graph.skp)


# ---------------------------------------------------------------------------
# public op factories
# ---------------------------------------------------------------------------


def role_major_i3(graph: HyperGraph) -> jnp.ndarray:
    """[3E] flat endpoint ids in role-major order [u... | q... | i...].
    Trace-safe: the graph may enter through jit arguments."""
    i3 = graph.i3
    return jnp.concatenate([i3[:, 0], i3[:, 1], i3[:, 2]])


def make_hyper_ops(graph: HyperGraph, bf16_stream: bool = False,
                   absorb: bool = False):
    """Returns (gather_roles_t, scatter_incidence_t) bound to one graph's
    static packing. Both operate feature-major.

    Contract: gather returns a 3-tuple (u, q, i) of [d, E'] role features
    in edge order (a tuple, not a stacked array — stacking would cost a
    full [3, d, E] copy in both directions); scatter consumes [d, E'].
    E' is exact E on the XLA and sharded paths; on the single-chip Pallas
    path E' = kp.e_pad (tail columns junk past E). Layers size everything
    off the arrays, so the contracts compose identically.

    ``bf16_stream``: cast node features to bf16 at the gather entry. The
    whole [d, E]-wide pipeline (expansion, permutation stages, interaction
    operands, scatter values, and the corresponding gradient streams) then
    moves half the HBM bytes. Rounding is no worse at the matmuls — MXU
    operands round to bf16 at default precision anyway (CLAUDE.md) — and
    all segment-sum ACCUMULATION stays f32; the incremental loss is one
    bf16 rounding of edge features before the scatter.
    """
    n = graph.node_count
    stream = jnp.bfloat16 if bf16_stream else None

    def _cast(x_t):
        return x_t.astype(stream) if stream is not None else x_t

    if getattr(graph, "skp", None) is not None:
        skp = graph.skp

        def gather_roles_t(x_t):
            # src_pad padding happens inside the shard_map body (the node
            # input may arrive node-sharded from the previous scatter).
            # f32-RS mode: pin the bf16 cast's output to the node-sharded
            # layout — without the constraint GSPMD is free to all-gather
            # the f32 INPUT of the convert and cast replicated, doubling
            # the gather-side collective bytes (observed in the compiled
            # v5e-8 HLO, SCALING_r05). Under the bf16-psum formulation
            # the input is already replicated and the pin would force a
            # slice + re-gather, so it stays off there.
            x16 = _cast(x_t)
            if stream is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from ihgnn_tpu.parallel.mesh import DATA_AXIS
                spec = P() if _bf16_rs_on() else P(None, DATA_AXIS)
                x16 = jax.lax.with_sharding_constraint(
                    x16, NamedSharding(skp.mesh, spec))
            return _gather_roles_sharded(x16, skp)

        def scatter_incidence_t(edge_t):
            return _scatter_sharded(edge_t, skp)

        return gather_roles_t, scatter_incidence_t

    if not use_pallas(graph):
        i3_flat = role_major_i3(graph)

        def gather_roles_t(x_t):
            e = i3_flat.shape[0] // 3
            x_t = _cast(x_t)
            return (x_t[:, i3_flat[:e]], x_t[:, i3_flat[e:2 * e]],
                    x_t[:, i3_flat[2 * e:]])

        def scatter_incidence_t(edge_t):
            # f32 accumulation regardless of the stream dtype
            out = xla_ops.hyperedge_scatter(edge_t.T.astype(jnp.float32),
                                            graph.inc_edge,
                                            graph.inc_node, n)
            return out.T

        return gather_roles_t, scatter_incidence_t

    kp = graph.kp

    if absorb:
        # absorbed-interaction contract: gather's i output is t1-ordered
        # and scatter takes the (edge_t, pre_i) pair the absorbed
        # interaction emits (see absorb_i_ok / interact.py)
        def gather_roles_t(x_t):
            x_pad = jnp.pad(_cast(x_t), ((0, 0), (0, kp.src_pad - n)))
            return _gather_pre_pallas(x_pad, kp)

        def scatter_pair_t(edge_pair):
            return _scatter2_pallas(edge_pair[0], edge_pair[1], kp)

        return gather_roles_t, scatter_pair_t

    def gather_roles_t(x_t):
        x_pad = jnp.pad(_cast(x_t), ((0, 0), (0, kp.src_pad - n)))
        return _gather_roles_pallas(x_pad, kp)

    def scatter_incidence_t(edge_t):
        return _scatter_pallas(edge_t, kp)

    return gather_roles_t, scatter_incidence_t


# ---------------------------------------------------------------------------
# 2D-graph SpMM (GCN path)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n):
    expanded_t = x_t[:, col] * val[None, :]
    return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n,
                             out_transposed=True)


def _spmm_fwd(x_t, col, val, ids2d, tile_ptr, n):
    return _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n), (col, val, ids2d,
                                                            tile_ptr,
                                                            x_t.shape[1])


def _spmm_bwd(n_out, res, cot):
    col, val, ids2d, tile_ptr, n_in = res
    # the 2D adjacency is symmetric in structure and values, so Aᵀ = A
    grad = _spmm_sym_t(cot, col, val, ids2d, tile_ptr, n_in)
    return (grad, _f0(col), jnp.zeros_like(val), _f0(ids2d), _f0(tile_ptr))


# ``val`` is treated as graph STRUCTURE, not a learnable weight: its
# cotangent is defined as zero (it cannot be in nondiff_argnums — those are
# baked static, and val is a runtime array). If edge values ever become
# trainable, _spmm_bwd must also return cot·x contractions per entry.
_spmm_sym_t.defvjp(_spmm_fwd, _spmm_bwd)


def _spmm_role_impl(x_t, rp, val, ids2d, tile_ptr, n, rows, cols):
    """Routed SpMM: the x[:, col] expansion runs the role-forward pipeline
    (windowed expand + Clos — no XLA row gather), then weighted CSR
    segment-sum by row id."""
    src_pad = rp.gather.src_pad
    x_pad = jnp.pad(x_t, ((0, 0), (0, src_pad - n)))
    expanded = _role_forward(x_pad, rp, rows, cols) * val[None, :]
    if not _kernels_active():
        ids = ids2d.reshape(-1)
        valid = ids < n
        vals = jnp.where(valid[None, :], expanded, 0).astype(jnp.float32)
        return jax.ops.segment_sum(vals.T, jnp.where(valid, ids, 0),
                                   num_segments=n).T
    return csr_segment_sum_t(expanded, ids2d, tile_ptr, n,
                             out_transposed=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _spmm_role_t(x_t, rp, val, ids2d, tile_ptr, n, rows, cols):
    return _spmm_role_impl(x_t, rp, val, ids2d, tile_ptr, n, rows, cols)


def _spmm_role_fwd(x_t, rp, val, ids2d, tile_ptr, n, rows, cols):
    return (_spmm_role_impl(x_t, rp, val, ids2d, tile_ptr, n, rows, cols),
            (rp, val, ids2d, tile_ptr))


def _spmm_role_bwd(n, rows, cols, res, cot):
    rp, val, ids2d, tile_ptr = res
    # A is symmetric in structure and values, so Aᵀ = A (see _spmm_bwd);
    # val's cotangent is structural zero, like _spmm_sym_t's
    grad = _spmm_role_impl(cot, rp, val, ids2d, tile_ptr, n, rows, cols)
    return (grad, _f0_tree(rp), jnp.zeros_like(val), _f0(ids2d),
            _f0(tile_ptr))


_spmm_role_t.defvjp(_spmm_role_fwd, _spmm_role_bwd)


def make_spmm_op(graph: Graph2D):
    """Symmetric-adjacency SpMM (feature-major): x_t [d, N] ↦ (A @ xᵀ)ᵀ.

    All 2D graph constructions are symmetric in structure and values
    (Helpers/Graph.py:40-63), so the VJP is the same SpMM of the
    cotangent."""
    n = graph.node_count

    if not use_pallas(graph):
        def spmm_t(x_t):
            return xla_ops.spmm(graph.row, graph.col, graph.val, x_t.T, n).T
        return spmm_t

    if getattr(graph, "pk_role", None) is not None:
        rp, val = graph.pk_role, graph.pk_val
        ids2d, tile_ptr = graph.pk_ids2d, graph.pk_tile_ptr
        rows, cols = graph.pk_rows, graph.pk_cols

        def spmm_t(x_t):
            return _spmm_role_t(x_t, rp, val, ids2d, tile_ptr, n, rows,
                                cols)

        return spmm_t

    col, val = graph.pk_col, graph.pk_val
    ids2d, tile_ptr = graph.pk_ids2d, graph.pk_tile_ptr

    def spmm_t(x_t):
        return _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n)

    return spmm_t
