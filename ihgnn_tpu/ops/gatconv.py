"""Routed feature-major GAT attention convolution (round 5).

Replaces the row-major `_GatCore` hot path (XLA `x[src]` row gathers on a
4x-lane-padded [nnz, d] + XLA segment softmax — 3,221 ms fwd at 12M nnz,
docs/GAT_PROBE.json) with the same machinery the IHGNN pipeline uses
(SURVEY.md §2.3: dgl edge_softmax / u_mul_e_sum contract,
/root/reference/Models/GnnLayers.py:88-115):

  x_src (entry order)    routed role-forward (windowed expand + Clos)
  x_dst / per-node rows  windowed gather (dst-sorted entries => banded)
  segment softmax        Pallas segment-max (segsum.py) + CSR segment-sums
  weighted aggregation   CSR segment-sum of alpha * x_src
  backward               the mirrored role-backward (permute-to-t1 +
                         segment-sum over src) plus dst-side scatters

Entries are DESTINATION-sorted (the reference's edge_softmax grouping);
the softmax math matches `_GatCore` exactly: LeakyReLU scores, masked
entries pinned to -1e30 before the max (all-masked segments then produce
uniform weights killed by the final mask multiply), per-destination
max-subtracted exp-normalize.

Everything data-dependent is host-packed once per graph (`GatPack`,
built by graph.build_graph2d) and rides custom-vjp signatures as explicit
pytree args (CLAUDE.md float0 rule).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ihgnn_tpu.models.common import LEAKY_SLOPE
from ihgnn_tpu.ops.hyperagg import (_expand, _f0_tree, _kernels_active,
                                    _permute_to_t1, _role_forward)
from ihgnn_tpu.ops.pallas.segsum import (csr_segment_max_t,
                                         csr_segment_sum_t, pack_csr_tiles)

_SENT = 2**31 - 1


@struct.dataclass
class GatPack:
    """Host-packed operands for one (src, dst)-edge-list attention conv."""
    src_rp: Any            # ops/packing.RolePack (with_bwd) over src ids
    src_ids2d: Any         # [K_pad/128, 128] int32 — src ids, t1 order
    src_tile_ptr: Any      # [T+1] int32
    dst_exp: Any           # ops/packing.ExpandPack — gather-by-dst
    dst_ids2d: Any         # [K_pad/128, 128] int32 — dst ids, entry order
    dst_tile_ptr: Any      # [T+1] int32
    entry_mask: Any        # [1, K_pad] f32 — live-entry validity
    n: int = struct.field(pytree_node=False, default=0)
    nnz: int = struct.field(pytree_node=False, default=0)
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    k_pad: int = struct.field(pytree_node=False, default=0)
    src_pad: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class ChunkedGatPack:
    """K GatPacks over contiguous dst-sorted entry slices.

    Beyond ~2M entries one grid leaves a stage with rows past the dg
    exchange cap (the chunking rationale of ops/packing.ChunkedHyperPack
    applies verbatim). Chunks slice the DST-sorted entry list, so each
    destination node's entries live in at most two adjacent chunks —
    per-chunk segment max/sum outputs combine with elementwise
    max/add over [*, N] arrays (cheap at node scale)."""
    packs: Any
    n: int = struct.field(pytree_node=False, default=0)
    nnz: int = struct.field(pytree_node=False, default=0)
    src_pad: int = struct.field(pytree_node=False, default=0)


def build_gat_pack(src: np.ndarray, dst: np.ndarray, node_count: int,
                   live: np.ndarray = None, cols: int = 1024,
                   chunk_rows_cap: int = 2048, src_cuts=()):
    """Pack a dst-SORTED edge list for `gat_conv_t`, or None on W_CAP
    fallback. ``live``: per-entry validity (mesh-padding val==0 entries
    are excluded from attention like `_GatCore`'s entry_mask). Entry
    lists longer than chunk_rows_cap * cols chunk into a
    ChunkedGatPack.

    ``src_cuts``: node-id boundaries of the id space's regions
    ([users | queries | items] for the 2D graph). A chunk whose
    destinations draw sources from DISJOINT regions (query dsts receive
    from users AND items) has sorted-src rows straddling the gap — far
    past the banded-window cap. Such chunks split into per-src-region
    sub-packs (a STABLE partition keeps each part dst-sorted, and the
    chunk combination math — per-pack segment max/sum joined by
    elementwise max/add — is partition-agnostic)."""
    nnz_total = int(np.shape(src)[0])
    s = (chunk_rows_cap or 0) * cols
    if chunk_rows_cap and (nnz_total > s or src_cuts):
        src, dst = np.asarray(src), np.asarray(dst)
        live = None if live is None else np.asarray(live)
        k = max(1, -(-nnz_total // s)) if s else 1
        subs = []
        for j in range(k):
            sl = slice(j * s, (j + 1) * s) if s else slice(None)
            pk = build_gat_pack(src[sl], dst[sl], node_count,
                                None if live is None else live[sl],
                                cols=cols, chunk_rows_cap=0)
            if pk is not None:
                subs.append(pk)
                continue
            # split this chunk by src region and retry per part
            cuts = list(src_cuts) + [node_count + 1]
            lo = 0
            ok = True
            for hi in cuts:
                m = (src[sl] >= lo) & (src[sl] < hi)
                lo = hi
                if not m.any():
                    continue
                pp = build_gat_pack(src[sl][m], dst[sl][m], node_count,
                                    None if live is None else live[sl][m],
                                    cols=cols, chunk_rows_cap=0)
                if pp is None:
                    ok = False
                    break
                subs.append(pp)
            if not ok:
                return None
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        src_pad = max(pk.src_pad for pk in subs)
        subs = [pk.replace(src_pad=src_pad) for pk in subs]
        return ChunkedGatPack(packs=tuple(subs), n=int(node_count),
                              nnz=nnz_total, src_pad=src_pad)
    from concurrent.futures import ThreadPoolExecutor

    from ihgnn_tpu.ops.packing import (EXPAND_COLS, W_CAP, _role_pack,
                                       _round_up)
    from ihgnn_tpu.ops.pallas.gather import pack_windows
    from ihgnn_tpu.ops.pallas.permute import pick_grid

    nnz = int(src.shape[0])
    if nnz == 0:
        return None
    dst = np.asarray(dst, np.int64)
    assert np.all(np.diff(dst) >= 0), "entries must be dst-sorted"
    rows, cols = pick_grid(nnz, cols)
    k_pad = rows * cols
    try:
        src64 = np.asarray(src, np.int64)
        order = np.argsort(src64, kind="stable")
        rank = np.empty(nnz, np.int64)
        rank[order] = np.arange(nnz)
        with ThreadPoolExecutor(max_workers=8) as pool:
            src_rp, src_ids_t1, sorted_src = _role_pack(
                src64, order, rank, rows, cols, pool, with_bwd=True)
        dst_pad = np.concatenate(
            [dst, np.full(k_pad - nnz, dst[-1], np.int64)])
        exp_cols = max(EXPAND_COLS, cols)
        dp = pack_windows(dst_pad.reshape(-1, exp_cols), w_cap=W_CAP)
    except ValueError:
        return None

    from ihgnn_tpu.ops.packing import ExpandPack
    dst_ids = np.concatenate(
        [dst.astype(np.int32), np.full(k_pad - nnz, _SENT, np.int32)])
    dst_tile_ptr, _ = pack_csr_tiles(dst, node_count)
    src_tile_ptr, _ = pack_csr_tiles(sorted_src, node_count)
    mask = np.zeros((1, k_pad), np.float32)
    mask[0, :nnz] = 1.0 if live is None else (
        np.asarray(live, np.float32) > 0)
    src_pad = max(src_rp.gather.src_pad, dp.src_pad,
                  _round_up(node_count, 128))
    return GatPack(
        src_rp=src_rp,
        src_ids2d=jnp.asarray(src_ids_t1.reshape(-1, 128)),
        src_tile_ptr=jnp.asarray(src_tile_ptr),
        dst_exp=ExpandPack(idx=dp.idx_rel, win=dp.win, w=dp.w,
                           src_pad=dp.src_pad),
        dst_ids2d=jnp.asarray(dst_ids.reshape(-1, 128)),
        dst_tile_ptr=jnp.asarray(dst_tile_ptr),
        entry_mask=jnp.asarray(mask),
        n=int(node_count), nnz=nnz, rows=rows, cols=cols, k_pad=k_pad,
        src_pad=int(src_pad),
    )


def _pad_nodes(a, src_pad):
    return jnp.pad(a, ((0, 0), (0, src_pad - a.shape[1])))


def _seg_sum(v, pk):
    """Entry-order segment sum by dst → [*, n] f32."""
    if not _kernels_active():
        ids = pk.dst_ids2d.reshape(-1)
        valid = ids < pk.n
        vv = jnp.where(valid[None, :], v, 0).astype(jnp.float32)
        return jax.ops.segment_sum(vv.T, jnp.where(valid, ids, 0),
                                   num_segments=pk.n).T
    return csr_segment_sum_t(v, pk.dst_ids2d, pk.dst_tile_ptr, pk.n,
                             out_transposed=True)


def _seg_max(s, pk):
    """Entry-order segment max by dst → [1, >=n] f32 (-3e38 empties)."""
    if not _kernels_active():
        ids = pk.dst_ids2d.reshape(-1)
        valid = ids < pk.n
        sv = jnp.where(valid, s.reshape(-1), -3.0e38)
        out = jax.ops.segment_max(
            jnp.where(valid, sv, -3.0e38), jnp.where(valid, ids, 0),
            num_segments=pk.n)
        return out.reshape(1, -1)
    return csr_segment_max_t(s.reshape(-1, 128), pk.dst_ids2d,
                             pk.dst_tile_ptr, pk.n)


def _src_scatter(v_t, pk):
    """Entry-order [*, K_pad] → per-src-node sums [*, n] f32 (the role
    backward: permute-to-t1 + CSR segment-sum, ids absorb the final
    stage)."""
    region = _permute_to_t1(v_t, pk.src_rp, pk.rows, pk.cols)
    if not _kernels_active():
        ids = pk.src_ids2d.reshape(-1)
        valid = ids < pk.n
        vv = jnp.where(valid[None, :], region, 0).astype(jnp.float32)
        return jax.ops.segment_sum(vv.T, jnp.where(valid, ids, 0),
                                   num_segments=pk.n).T
    return csr_segment_sum_t(region, pk.src_ids2d, pk.src_tile_ptr, pk.n,
                             out_transposed=True)


def _leaky(x):
    return jnp.where(x > 0, x, LEAKY_SLOPE * x)


def _packs(pk):
    return pk.packs if isinstance(pk, ChunkedGatPack) else (pk,)


def _gat_impl(x_t, khead, bhead, pk, head):
    """Forward; returns (out [d, n] f32, residuals). Chunked packs loop
    contiguous dst-range slices; per-chunk segment outputs combine with
    elementwise max/add over [*, n] node arrays."""
    d, n = x_t.shape
    x_pad = _pad_nodes(x_t, pk.src_pad)
    packs = _packs(pk)
    if head == "concat":
        w_src, w_dst = khead[:d, 0], khead[d:, 0]
        sd_pad = _pad_nodes(w_dst[None, :] @ x_t, pk.src_pad)

    xs_l, xd_l, pre_l = [], [], []
    for p in packs:
        xs = _role_forward(x_pad, p.src_rp, p.rows, p.cols)  # [d, K_pad]
        if head == "concat":
            pre = (w_src[None, :] @ xs + _expand(sd_pad, p.dst_exp)
                   + bhead[:, None])
            xd = None
        else:                                                # product head
            xd = _expand(x_pad, p.dst_exp)
            pre = khead[:, 0][None, :] @ (xs * xd) + bhead[:, None]
        xs_l.append(xs)
        xd_l.append(xd)
        pre_l.append(pre)

    s_l = [jnp.where(p.entry_mask > 0, _leaky(pre), -1e30)
           for p, pre in zip(packs, pre_l)]
    m = None
    for p, s in zip(packs, s_l):
        mk = _seg_max(s, p)[:, :n]
        m = mk if m is None else jnp.maximum(m, mk)
    m_pad = _pad_nodes(m, pk.src_pad)
    w_l = [jnp.exp(s - _expand(m_pad, p.dst_exp)) * p.entry_mask
           for p, s in zip(packs, s_l)]
    den = None
    for p, w_ in zip(packs, w_l):
        dk = _seg_sum(w_, p)
        den = dk if den is None else den + dk
    den_pad = _pad_nodes(den, pk.src_pad)
    alpha_l = [w_ / jnp.maximum(_expand(den_pad, p.dst_exp), 1e-30)
               for p, w_ in zip(packs, w_l)]
    out = None
    for p, xs, alpha in zip(packs, xs_l, alpha_l):
        ok = _seg_sum(xs * alpha, p)
        out = ok if out is None else out + ok
    return out, (tuple(xs_l), tuple(xd_l), tuple(alpha_l), tuple(pre_l))


def _gat_bwd_impl(x_t, khead, res, cot, pk, head):
    d, n = x_t.shape
    xs_l, xd_l, alpha_l, pre_l = res
    packs = _packs(pk)
    cot_pad = _pad_nodes(cot.astype(jnp.float32), pk.src_pad)

    cot_e_l = [_expand(cot_pad, p.dst_exp) for p in packs]
    dxs_l = [a * c for a, c in zip(alpha_l, cot_e_l)]
    tt_l = [a * jnp.sum(xs * c, axis=0, keepdims=True)
            for a, xs, c in zip(alpha_l, xs_l, cot_e_l)]
    tsum = None
    for p, tt in zip(packs, tt_l):
        tk = _seg_sum(tt, p)
        tsum = tk if tsum is None else tsum + tk
    tsum_pad = _pad_nodes(tsum, pk.src_pad)
    g_l = [(tt - a * _expand(tsum_pad, p.dst_exp))
           * jnp.where(pre > 0, 1.0, LEAKY_SLOPE) * p.entry_mask
           for p, tt, a, pre in zip(packs, tt_l, alpha_l, pre_l)]
    db = sum(jnp.sum(g, axis=1) for g in g_l)                # [1]

    if head == "concat":
        w_src, w_dst = khead[:d, 0], khead[d:, 0]
        gd = None
        for p, g in zip(packs, g_l):
            gk = _seg_sum(g, p)
            gd = gk if gd is None else gd + gk
        dx = w_dst[:, None] * gd
        dw_src = None
        for p, xs, g, dxs in zip(packs, xs_l, g_l, dxs_l):
            dx = dx + _src_scatter(dxs + w_src[:, None] * g, p)
            dws = jnp.sum(xs * g, axis=1)
            dw_src = dws if dw_src is None else dw_src + dws
        dw_dst = jnp.sum(x_t * gd, axis=1)
        dkhead = jnp.concatenate([dw_src, dw_dst])[:, None]
    else:
        w_p = khead[:, 0]
        dw_p, dx = None, None
        for p, xs, xd, g, dxs in zip(packs, xs_l, xd_l, g_l, dxs_l):
            dwk = jnp.sum((xs * xd) * g, axis=1)
            dw_p = dwk if dw_p is None else dw_p + dwk
            part = (_src_scatter(dxs + w_p[:, None] * g * xd, p)
                    + _seg_sum(w_p[:, None] * g * xs, p))
            dx = part if dx is None else dx + part
        dkhead = dw_p[:, None]
    return dx.astype(x_t.dtype), dkhead.astype(khead.dtype), db


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_conv_t(x_t, khead, bhead, pk, head: str = "concat"):
    """Feature-major GAT conv: x_t [d, n] → [d, n] f32 attention output.

    khead: the score Dense kernel ([2d, 1] concat head / [d, 1] product);
    bhead: its bias [1]. Semantics match `_GatCore` (segment softmax over
    destination with masked entries excluded)."""
    return _gat_impl(x_t, khead, bhead, pk, head)[0]


def _gat_fwd(x_t, khead, bhead, pk, head):
    out, res = _gat_impl(x_t, khead, bhead, pk, head)
    return out, (x_t, khead, res, pk)


def _gat_bwd(head, saved, cot):
    x_t, khead, res, pk = saved
    dx, dkhead, db = _gat_bwd_impl(x_t, khead, res, cot, pk, head)
    return dx, dkhead, db, _f0_tree(pk)


gat_conv_t.defvjp(_gat_fwd, _gat_bwd)
