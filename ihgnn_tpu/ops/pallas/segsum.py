"""Pallas TPU kernel: sorted CSR segment-sum (the H·E scatter side).

Replaces XLA's scatter-add lowering of ``jax.ops.segment_sum`` (serial,
~860 ms for 6M incidence entries on v5e) with a node-tile accumulation
kernel built on the one-hot MXU trick:

  grid = node tiles of TILE_N rows. Each program streams its tile's
  incidence entries (node-major sorted, so they form a contiguous range
  [tile_ptr[t], tile_ptr[t+1]) of the expanded value array) in BLOCK-entry
  DMA blocks (NBUF-deep pipeline), then for each SUB-entry sub-chunk builds
  a one-hot [TILE_N, SUB] matrix from local node offsets and accumulates on
  the MXU into a VMEM accumulator. No atomics, no data-dependent stores —
  each program writes one contiguous [TILE_N, d] block.

Layouts chosen for Mosaic's tiling rules:
* values arrive **feature-major** ([d, K_pad]): the entry axis is the
  128-lane axis, so [d, BLOCK] DMA slices at BLOCK-aligned offsets are
  legal, and the MXU contraction runs over the entry axis.
* ids are pre-reshaped [K_pad/128, 128] ((1,128)-tiled), DMA'd 8 rows at a
  time.
* the MXU contraction uses a two-pass bf16 hi/lo value split (~f32
  accuracy, max err ~6e-5 on 6M-entry sums, vs 0.4%% rel error for the
  naive single bf16 pass and 1.7x the cost of six-pass HIGHEST).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128    # segment rows per program (output tile height)
SUB = 128       # entries per one-hot matmul
# Default entries per DMA block. Larger packs may use a bigger block (a
# static per-call parameter): the Clos-stage-into-ids fusion requires
# stage rows to nest inside blocks, so cols=2048 grids (stress scale,
# where squarer grids halve the long-row stage cost) need block=2048.
# Small-N graphs keep 1024 — every tile scans whole blocks, so block
# size is boundary waste when entries-per-tile ~ block.
BLOCK = 1024
NSUB = BLOCK // SUB     # sub-chunks per default block (segscan.py)
NBUF = 4        # DMA pipeline depth (blocks in flight)


def _maskstore_on() -> bool:
    """bf16 wide-block path (round 4, measured LOSS — off by default):
    build the [TILE_N, block] one-hot in a VMEM scratch with aligned
    lane-range stores (dodging the broken Mosaic lane-CONCAT of
    sublane-offset id slices) and run ONE MXU matmul per block instead of
    nsub. On chip this measured 6.885 vs 6.209 ms at the bench scatter
    shape (docs/SEGSUM_WIDE_PROBE.jsonl): the kernel sits AT the MXU
    one-hot floor (~1 cycle/entry), so cutting matmul issues buys nothing
    and the mask stores are pure extra VPU work. Kept as a measured
    variant behind IHGNN_SEGSUM_MASKSTORE=1."""
    import os
    return os.environ.get("IHGNN_SEGSUM_MASKSTORE", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_csr_tiles(segment_ids: np.ndarray, num_segments: int,
                   tile_n: int = TILE_N) -> Tuple[np.ndarray, int]:
    """Sorted segment ids → per-tile entry offsets.

    Returns (tile_ptr [T+1] int32, padded segment count). tile_ptr[t] is
    the index of the first entry whose segment id >= t*tile_n.
    """
    n_pad = _round_up(max(num_segments, 1), tile_n)
    n_tiles = n_pad // tile_n
    bounds = np.arange(0, (n_tiles + 1) * tile_n, tile_n)
    tile_ptr = np.searchsorted(segment_ids, bounds, side="left").astype(np.int32)
    return tile_ptr, n_pad


def _make_segsum_kernel(out_transposed: bool, block: int, sub: int,
                        use_mask: bool):
    def kernel(*args):
        if use_mask:
            *a, mask_scr = args
        else:
            a, mask_scr = args, None
        _segsum_kernel(*a, mask_scr=mask_scr, out_transposed=out_transposed,
                       block=block, sub=sub)
    return kernel


def _segsum_kernel(tile_ptr_ref, values_t_hbm, ids_hbm, out_ref, acc, vbuf,
                   nbuf, sems, ctr, mask_scr=None, out_transposed=False,
                   block=BLOCK, sub=SUB):
    """Streaming variant: the entry stream is consumed in order across the
    whole grid, so the DMA pipeline is GLOBAL — two SMEM counters
    (next-unfetched block, next-unwaited block) persist across grid
    programs, and each tile extends the prefetch window NBUF blocks past
    its own consumption point. Without this, every one of the ~N/128
    programs pays a full DMA latency on its first (usually only) block —
    which dominated the kernel (~2 us x 5.5k tiles on v5e at 6M entries).
    """
    nsub = block // SUB
    t = pl.program_id(0)
    start = tile_ptr_ref[t]
    end = tile_ptr_ref[t + 1]
    node_base = t * TILE_N
    total_blocks = ids_hbm.shape[0] // nsub

    g0 = start // block
    g1 = jnp.where(end > start, (end - 1) // block, g0 - 1)   # inclusive

    @pl.when(t == 0)
    def _():
        ctr[0] = 0    # next block to start fetching
        ctr[1] = 0    # next block to wait on

    def dmas(g):
        return (
            pltpu.make_async_copy(
                values_t_hbm.at[:, pl.ds(pl.multiple_of(g * block, block),
                                         block)],
                vbuf.at[jax.lax.rem(g, NBUF)],
                sems.at[jax.lax.rem(g, NBUF), 0]),
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(g * nsub, nsub), :],
                nbuf.at[jax.lax.rem(g, NBUF)],
                sems.at[jax.lax.rem(g, NBUF), 1]),
        )

    acc[...] = jnp.zeros_like(acc)

    def body(g, _):
        # extend the global prefetch window to g + NBUF - 1 (never
        # overwrites: fetched-1 - NBUF <= g - 1, already consumed)
        tgt = jnp.minimum(g + NBUF - 1, total_blocks - 1)

        def fetch(gg, _):
            for d in dmas(gg):
                d.start()
            return 0

        fetched = ctr[0]
        jax.lax.fori_loop(jnp.maximum(fetched, g), tgt + 1, fetch, 0)
        ctr[0] = jnp.maximum(fetched, tgt + 1)

        # wait each block's semaphores exactly once (boundary blocks are
        # shared with the previous tile, which already waited)
        def wait1(gg, _):
            for d in dmas(gg):
                d.wait()
            return 0

        waited = ctr[1]
        jax.lax.fori_loop(jnp.maximum(waited, g), g + 1, wait1, 0)
        ctr[1] = jnp.maximum(waited, g + 1)

        slot = jax.lax.rem(g, NBUF)
        if mask_scr is not None:
            # Wide-block path (round 4, bf16 streams): build the whole
            # [TILE_N, block] one-hot in scratch via lane-ALIGNED 128-wide
            # stores (the lane-CONCAT of sublane-offset id slices that the
            # sub>128 variant below needs is broken in real Mosaic — see
            # that comment), then ONE MXU matmul per block: 1/nsub the
            # matmul issues and acc read-modify-writes.
            iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, SUB), 0)
            for j in range(nsub):
                local = nbuf[slot][j].reshape(1, SUB) - node_base
                mask_scr[:, j * SUB:(j + 1) * SUB] = (
                    iota == local).astype(jnp.bfloat16)
            v = vbuf[slot]                               # [d, block] bf16
            dims = (((1,), (1,)), ((), ()))
            if out_transposed:
                acc[...] += jax.lax.dot_general(
                    v, mask_scr[...], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
            else:
                acc[...] += jax.lax.dot_general(
                    mask_scr[...], v, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
            return 0
        rows_per_sub = sub // SUB
        for j in range(block // sub):
            # sub > 128 is EXPERIMENTAL and off by default: real Mosaic
            # rejects the lane-concat of sublane-offset id slices
            # ("result/input offset mismatch on non-concat dimension")
            # that interpret mode accepts; a mask-side concat variant is
            # untested on chip. Default sub=SUB takes the single-row path.
            parts = [nbuf[slot][j * rows_per_sub + t].reshape(1, SUB)
                     for t in range(rows_per_sub)]
            nodes = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
            # node-range filtering (no positional mask): entries whose node
            # falls outside this tile — neighbors' shares of boundary
            # blocks, sentinel padding, out-of-order entries within a block
            # — simply match no one-hot row. This is what lets callers
            # store ids in any within-block order (the Clos stage-2 fusion
            # in ops/packing.py).
            local = nodes - node_base
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (TILE_N, sub), 0)
                      == local).astype(jnp.bfloat16)
            # f32 values: bf16 hi/lo split (~f32 accuracy; the one-hot side
            # is exact), M-packed — hi and lo stack along the feature axis
            # so a single MXU pass computes both (M = 2d ≤ 128 is spare
            # capacity at d = 32; see permute.py). bf16 values: single
            # pass, products are exact and accumulate in f32.
            v = vbuf[slot][:, j * sub:(j + 1) * sub]
            d = v.shape[0]
            if v.dtype == jnp.bfloat16:
                vs = v
            else:
                vhi = v.astype(jnp.bfloat16)
                vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
                vs = jnp.concatenate([vhi, vlo], axis=0)     # [2d, SUB]
            dims = (((1,), (1,)), ((), ()))
            if out_transposed:
                # both [2d, TILE_N] = vs [2d, SUB] · onehotᵀ
                both = jax.lax.dot_general(
                    vs, onehot, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                acc[...] += both if vs is v else both[:d] + both[d:]
            else:
                both = jax.lax.dot_general(
                    onehot, vs, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                acc[...] += both if vs is v else both[:, :d] + both[:, d:]
        return 0

    jax.lax.fori_loop(g0, g1 + 1, body, 0, unroll=False)

    # drain: the global prefetch window can extend past the last block any
    # tile consumes (e.g. the region-sentinel tail of the fused hypergraph
    # layout ends after the final node tile's range) — the kernel must not
    # exit with started-but-unwaited DMAs or Mosaic reports a pending
    # semaphore as an internal error
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def wfin(gg, _):
            for dma in dmas(gg):
                dma.wait()
            return 0

        jax.lax.fori_loop(ctr[1], ctr[0], wfin, 0)

    out_ref[...] = acc[...]


# ---------------------------------------------------------------------------
# Three-region variant: the hypergraph scatter sums a [u | q | i] concat of
# three [d, E_pad] role streams (ops/hyperagg._segsum_regions). Materializing
# that concat costs a full extra [d, 3E] HBM round-trip per call (~1 ms at
# the 2M-edge bench, 4 calls/step). Here the kernel takes the three streams
# as SEPARATE HBM refs and each DMA block picks its source ref by region
# (traced `pl.when` branches around the async-copy start/wait — regions are
# block-aligned because E_pad is a multiple of the DMA block).
# ---------------------------------------------------------------------------


def _make_segsum3_kernel(out_transposed: bool, block: int, sub: int,
                         use_mask: bool):
    def kernel(*args):
        if use_mask:
            *a, mask_scr = args
        else:
            a, mask_scr = args, None
        _segsum3_kernel(*a, mask_scr=mask_scr, out_transposed=out_transposed,
                        block=block, sub=sub)
    return kernel


def _segsum3_kernel(tile_ptr_ref, vu_hbm, vq_hbm, vi_hbm, ids_hbm, out_ref,
                    acc, vbuf, nbuf, sems, ctr, mask_scr=None,
                    out_transposed=False, block=BLOCK, sub=SUB):
    """_segsum_kernel with the value stream split across three region refs
    (same global streaming-DMA pipeline; see _segsum_kernel)."""
    nsub = block // SUB
    t = pl.program_id(0)
    start = tile_ptr_ref[t]
    end = tile_ptr_ref[t + 1]
    node_base = t * TILE_N
    total_blocks = ids_hbm.shape[0] // nsub
    bpr = total_blocks // 3                    # blocks per region

    g0 = start // block
    g1 = jnp.where(end > start, (end - 1) // block, g0 - 1)

    @pl.when(t == 0)
    def _():
        ctr[0] = 0
        ctr[1] = 0

    def id_dma(g):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds(g * nsub, nsub), :],
            nbuf.at[jax.lax.rem(g, NBUF)],
            sems.at[jax.lax.rem(g, NBUF), 1])

    def val_dma(ref, g, ridx):
        local = g - ridx * bpr
        return pltpu.make_async_copy(
            ref.at[:, pl.ds(pl.multiple_of(local * block, block), block)],
            vbuf.at[jax.lax.rem(g, NBUF)],
            sems.at[jax.lax.rem(g, NBUF), 0])

    def start_dmas(g):
        for ridx, ref in enumerate((vu_hbm, vq_hbm, vi_hbm)):
            @pl.when(g // bpr == ridx)
            def _(ref=ref, ridx=ridx):
                val_dma(ref, g, ridx).start()
        id_dma(g).start()

    def wait_dmas(g):
        for ridx, ref in enumerate((vu_hbm, vq_hbm, vi_hbm)):
            @pl.when(g // bpr == ridx)
            def _(ref=ref, ridx=ridx):
                val_dma(ref, g, ridx).wait()
        id_dma(g).wait()

    acc[...] = jnp.zeros_like(acc)

    def body(g, _):
        tgt = jnp.minimum(g + NBUF - 1, total_blocks - 1)

        def fetch(gg, _):
            start_dmas(gg)
            return 0

        fetched = ctr[0]
        jax.lax.fori_loop(jnp.maximum(fetched, g), tgt + 1, fetch, 0)
        ctr[0] = jnp.maximum(fetched, tgt + 1)

        def wait1(gg, _):
            wait_dmas(gg)
            return 0

        waited = ctr[1]
        jax.lax.fori_loop(jnp.maximum(waited, g), g + 1, wait1, 0)
        ctr[1] = jnp.maximum(waited, g + 1)

        slot = jax.lax.rem(g, NBUF)
        if mask_scr is not None:
            # wide-block single-matmul path; see _segsum_kernel
            iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, SUB), 0)
            for j in range(nsub):
                local = nbuf[slot][j].reshape(1, SUB) - node_base
                mask_scr[:, j * SUB:(j + 1) * SUB] = (
                    iota == local).astype(jnp.bfloat16)
            v = vbuf[slot]
            dims = (((1,), (1,)), ((), ()))
            if out_transposed:
                acc[...] += jax.lax.dot_general(
                    v, mask_scr[...], dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
            else:
                acc[...] += jax.lax.dot_general(
                    mask_scr[...], v, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
            return 0
        for j in range(block // sub):
            nodes = nbuf[slot][j].reshape(1, SUB)
            local = nodes - node_base
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (TILE_N, sub), 0)
                      == local).astype(jnp.bfloat16)
            v = vbuf[slot][:, j * sub:(j + 1) * sub]
            d = v.shape[0]
            if v.dtype == jnp.bfloat16:
                vs = v
            else:
                vhi = v.astype(jnp.bfloat16)
                vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
                vs = jnp.concatenate([vhi, vlo], axis=0)
            dims = (((1,), (1,)), ((), ()))
            if out_transposed:
                both = jax.lax.dot_general(
                    vs, onehot, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                acc[...] += both if vs is v else both[:d] + both[d:]
            else:
                both = jax.lax.dot_general(
                    onehot, vs, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
                acc[...] += both if vs is v else both[:, :d] + both[:, d:]
        return 0

    jax.lax.fori_loop(g0, g1 + 1, body, 0, unroll=False)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def wfin(gg, _):
            wait_dmas(gg)
            return 0

        jax.lax.fori_loop(ctr[1], ctr[0], wfin, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "interpret",
                                    "out_transposed", "block"))
def csr_segment_sum3_t(vu_t: jnp.ndarray, vq_t: jnp.ndarray,
                       vi_t: jnp.ndarray, segment_ids_2d: jnp.ndarray,
                       tile_ptr: jnp.ndarray, num_segments: int,
                       interpret: bool = False,
                       out_transposed: bool = False,
                       block: int = BLOCK) -> jnp.ndarray:
    """``csr_segment_sum_t`` over the virtual concat [vu | vq | vi] of
    three equal-width [d, E_pad] region streams — no concat materialized.
    ``segment_ids_2d``/``tile_ptr`` address the 3*E_pad concat layout."""
    d, e_pad = vu_t.shape
    assert vq_t.shape == vi_t.shape == (d, e_pad), (vu_t.shape, vq_t.shape)
    assert e_pad % block == 0, (e_pad, block)
    n_tiles = tile_ptr.shape[0] - 1
    n_pad = n_tiles * TILE_N

    if out_transposed:
        out_spec = pl.BlockSpec((d, TILE_N), lambda t, ptr: (0, t),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((d, n_pad), jnp.float32)
        acc_shape = (d, TILE_N)
    else:
        out_spec = pl.BlockSpec((TILE_N, d), lambda t, ptr: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, d), jnp.float32)
        acc_shape = (TILE_N, d)

    use_mask = _maskstore_on() and vu_t.dtype == jnp.bfloat16
    scratch = [
        pltpu.VMEM(acc_shape, jnp.float32),
        pltpu.VMEM((NBUF, d, block), vu_t.dtype),
        pltpu.VMEM((NBUF, block // SUB, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((NBUF, 2)),
        pltpu.SMEM((2,), jnp.int32),
    ]
    if use_mask:
        scratch.append(pltpu.VMEM((TILE_N, block), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        _make_segsum3_kernel(out_transposed, block, SUB, use_mask),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_ptr, vu_t, vq_t, vi_t, segment_ids_2d)
    return out[:, :num_segments] if out_transposed else out[:num_segments]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "interpret",
                                    "out_transposed", "block", "sub"))
def csr_segment_sum_t(values_t: jnp.ndarray, segment_ids_2d: jnp.ndarray,
                      tile_ptr: jnp.ndarray, num_segments: int,
                      interpret: bool = False,
                      out_transposed: bool = False,
                      block: int = BLOCK, sub: int = SUB) -> jnp.ndarray:
    """Sorted segment-sum over feature-major values.

    Args:
      values_t: [d, K_pad] — entry rows to sum (feature-major), sorted by
        segment id along axis 1, K_pad a multiple of BLOCK. Sortedness is
        only required at BLOCK granularity: entries may sit in any order
        *within* a 1024-entry DMA block provided ``tile_ptr`` positions
        are consistent with block membership (entries are matched to
        output tiles by their id, not their position). Ids outside any
        tile's range (e.g. int32-max sentinels on padding) are dropped.
      segment_ids_2d: [K_pad / 128, 128] int32 ids (see ordering rule).
      tile_ptr: [T+1] int32 from ``pack_csr_tiles``.
      num_segments: unpadded segment count N.
      out_transposed: return [d, N] (feature-major, lane-packing friendly)
        instead of [N, d].
    Returns [N, d] sums ([d, N] when out_transposed).
    """
    d, k_pad = values_t.shape
    assert k_pad % block == 0, (k_pad, block)
    n_tiles = tile_ptr.shape[0] - 1
    n_pad = n_tiles * TILE_N

    if out_transposed:
        out_spec = pl.BlockSpec((d, TILE_N), lambda t, ptr: (0, t),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((d, n_pad), jnp.float32)
        acc_shape = (d, TILE_N)
    else:
        out_spec = pl.BlockSpec((TILE_N, d), lambda t, ptr: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, d), jnp.float32)
        acc_shape = (TILE_N, d)

    use_mask = _maskstore_on() and values_t.dtype == jnp.bfloat16
    scratch = [
        pltpu.VMEM(acc_shape, jnp.float32),
        pltpu.VMEM((NBUF, d, block), values_t.dtype),
        pltpu.VMEM((NBUF, block // SUB, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((NBUF, 2)),
        pltpu.SMEM((2,), jnp.int32),
    ]
    if use_mask:
        scratch.append(pltpu.VMEM((TILE_N, block), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    assert block % sub == 0 and sub % SUB == 0, (block, sub)
    out = pl.pallas_call(
        _make_segsum_kernel(out_transposed, block, sub, use_mask),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_ptr, values_t, segment_ids_2d)
    return out[:, :num_segments] if out_transposed else out[:num_segments]


# ---------------------------------------------------------------------------
# Multi-chunk three-region variant (round 5): ChunkedHyperPack scatters ran
# ONE segsum PER CHUNK and added the [d, N] partials — at the 10M-edge
# stress shape that is 5 full node-tile sweeps (27k tiles each, ~5.5 ms of
# per-tile overhead per sweep) plus 4 extra [d, N] f32 write+read+add
# passes (450 MB each) per scatter call. This kernel walks ALL chunks'
# [u | q | i] region streams inside one node-tile grid: per tile, K block
# ranges (one per chunk, each with its own ids/tile_ptr) accumulate into a
# single VMEM accumulator, and the [d, N] output is written once.
# The u region reads the FULL concatenated edge stream at static per-chunk
# offsets (chunks are contiguous slices of the concat), so no per-chunk
# u slices are materialized.
# ---------------------------------------------------------------------------


def _make_segsum3_multi_kernel(out_transposed: bool, blocks: tuple,
                               u_offs: tuple, nbuf_k: int,
                               base_tile: int = 0):
    def kernel(*args):
        _segsum3_multi_kernel(*args, out_transposed=out_transposed,
                              blocks=blocks, u_offs=u_offs, nbuf_k=nbuf_k,
                              base_tile=base_tile)
    return kernel


def _segsum3_multi_kernel(tptr_ref, vu_hbm, *rest, out_transposed, blocks,
                          u_offs, nbuf_k, base_tile=0):
    """K-chunk [u|q|i] segment sum. ``rest`` unpacks as K vq refs, K vi
    refs, K ids refs, out_ref, then scratch (acc, vbuf, nbuf, sems, ctr).
    ``blocks``: per-chunk DMA block size (= pack seg_block); ``u_offs``:
    static chunk offsets into the concatenated u stream."""
    k_chunks = len(blocks)
    vq = rest[:k_chunks]
    vi = rest[k_chunks:2 * k_chunks]
    idr = rest[2 * k_chunks:3 * k_chunks]
    out_ref = rest[3 * k_chunks]
    acc, vbuf, nbuf, sems, ctr = rest[3 * k_chunks + 1:]

    t = pl.program_id(0)
    node_base = (base_tile + t) * TILE_N

    @pl.when(t == 0)
    def _():
        for j in range(2 * k_chunks):
            ctr[j] = 0

    acc[...] = jnp.zeros_like(acc)

    for k in range(k_chunks):
        block = blocks[k]
        nsub = block // SUB
        total_blocks = idr[k].shape[0] // nsub
        bpr = total_blocks // 3
        start = tptr_ref[k, t]
        end = tptr_ref[k, t + 1]
        g0 = start // block
        g1 = jnp.where(end > start, (end - 1) // block, g0 - 1)

        def id_dma(g, k=k, block=block, nsub=nsub):
            return pltpu.make_async_copy(
                idr[k].at[pl.ds(g * nsub, nsub), :],
                nbuf.at[k, jax.lax.rem(g, nbuf_k)],
                sems.at[k, jax.lax.rem(g, nbuf_k), 1])

        def val_dma(g, k=k, block=block, bpr=bpr):
            slot = jax.lax.rem(g, nbuf_k)
            local = g - (g // bpr) * bpr
            dmas = []
            for ridx, ref in ((0, vu_hbm), (1, vq[k]), (2, vi[k])):
                off = (u_offs[k] if ridx == 0 else 0)

                def mk(ref=ref, off=off, local=local, slot=slot,
                       block=block):
                    return pltpu.make_async_copy(
                        ref.at[:, pl.ds(
                            pl.multiple_of(off + local * block, block),
                            block)],
                        vbuf.at[k, slot],
                        sems.at[k, slot, 0])
                dmas.append((ridx, mk))
            return dmas

        def start_dmas(g, k=k, bpr=bpr):
            for ridx, mk in val_dma(g):
                @pl.when(g // bpr == ridx)
                def _(mk=mk):
                    mk().start()
            id_dma(g).start()

        def wait_dmas(g, k=k, bpr=bpr):
            for ridx, mk in val_dma(g):
                @pl.when(g // bpr == ridx)
                def _(mk=mk):
                    mk().wait()
            id_dma(g).wait()

        def body(g, _, k=k, block=block, nsub=nsub,
                 total_blocks=total_blocks):
            tgt = jnp.minimum(g + nbuf_k - 1, total_blocks - 1)

            def fetch(gg, _):
                start_dmas(gg)
                return 0

            fetched = ctr[2 * k]
            jax.lax.fori_loop(jnp.maximum(fetched, g), tgt + 1, fetch, 0)
            ctr[2 * k] = jnp.maximum(fetched, tgt + 1)

            def wait1(gg, _):
                wait_dmas(gg)
                return 0

            waited = ctr[2 * k + 1]
            jax.lax.fori_loop(jnp.maximum(waited, g), g + 1, wait1, 0)
            ctr[2 * k + 1] = jnp.maximum(waited, g + 1)

            slot = jax.lax.rem(g, nbuf_k)
            for j in range(nsub):
                nodes = nbuf[k, slot][j].reshape(1, SUB)
                local = nodes - node_base
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (TILE_N, SUB), 0) == local
                ).astype(jnp.bfloat16)
                v = vbuf[k, slot][:, j * SUB:(j + 1) * SUB]
                d = v.shape[0]
                if v.dtype == jnp.bfloat16:
                    vs = v
                else:
                    vhi = v.astype(jnp.bfloat16)
                    vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
                    vs = jnp.concatenate([vhi, vlo], axis=0)
                dims = (((1,), (1,)), ((), ()))
                if out_transposed:
                    both = jax.lax.dot_general(
                        vs, onehot, dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    acc[...] += both if vs is v else both[:d] + both[d:]
                else:
                    both = jax.lax.dot_general(
                        onehot, vs, dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                    acc[...] += both if vs is v else both[:, :d] + both[:, d:]
            return 0

        jax.lax.fori_loop(g0, g1 + 1, body, 0, unroll=False)

        @pl.when(t == pl.num_programs(0) - 1)
        def _(k=k):
            def wfin(gg, _):
                wait_dmas(gg)
                return 0

            jax.lax.fori_loop(ctr[2 * k + 1], ctr[2 * k], wfin, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "interpret",
                                    "out_transposed", "blocks", "u_offs"))
def csr_segment_sum3_multi(vu_full: jnp.ndarray, vqs, vis, ids_list,
                           tptr_stack: jnp.ndarray, num_segments: int,
                           blocks: tuple, u_offs: tuple,
                           interpret: bool = False,
                           out_transposed: bool = True) -> jnp.ndarray:
    """K-chunk [u | q | i] segment sum into ONE [d, N] output.

    vu_full: [d, sum e_pad_k] — the concatenated edge stream (u regions
      read at static ``u_offs`` offsets).
    vqs/vis: K-tuples of [d, e_pad_k] region streams (t1 order).
    ids_list: K-tuple of [3*e_pad_k/128, 128] int32 region ids.
    tptr_stack: [K, T+1] int32 — each chunk's pack tile_ptr.
    blocks: per-chunk DMA block size (pack seg_block)."""
    k_chunks = len(vqs)
    d = vu_full.shape[0]
    n_tiles = tptr_stack.shape[1] - 1
    n_pad = n_tiles * TILE_N
    nbuf_k = 2 if k_chunks > 2 else NBUF
    max_block = max(blocks)

    # SMEM holds ~1 MB: at stress-plus node counts (N = 35M at the
    # 100M-plan shard leg) the K-row tile_ptr prefetch exceeds it, so the
    # node-tile grid splits into several calls over tile ranges (the
    # global streaming counters restart cleanly at each call's first
    # range — fetch/wait loops start from each tile's own g0)
    import os
    smem_budget = int(os.environ.get("IHGNN_SEGSUM_SMEM_BUDGET",
                                     900 << 10))
    # SMEM operands pad to (8, 128)-multiples — size the split on the
    # PADDED footprint (a [6, 34181] int32 prefetch allocates [8, 34304])
    def _padded_bytes(n_splits):
        rows = -(-k_chunks // 8) * 8
        cols_p = -(-(n_tiles // n_splits + 2) // 128) * 128
        return rows * cols_p * 4

    n_splits = 1
    while _padded_bytes(n_splits) > smem_budget:
        n_splits *= 2
    if n_splits > 1:
        per = -(-n_tiles // n_splits)
        outs = []
        for sidx in range(n_splits):
            t0 = sidx * per
            t1 = min(n_tiles, t0 + per)
            if t1 <= t0:
                break
            sub = _segsum3_multi_call(
                vu_full, vqs, vis, ids_list, tptr_stack[:, t0:t1 + 1],
                blocks, u_offs, nbuf_k, max_block, interpret,
                out_transposed, base_tile=t0)
            outs.append(sub)
        out = jnp.concatenate(outs, axis=1 if out_transposed else 0)
        return (out[:, :num_segments] if out_transposed
                else out[:num_segments])

    out = _segsum3_multi_call(vu_full, vqs, vis, ids_list, tptr_stack,
                              blocks, u_offs, nbuf_k, max_block,
                              interpret, out_transposed)
    return (out[:, :num_segments] if out_transposed
            else out[:num_segments])


def _segsum3_multi_call(vu_full, vqs, vis, ids_list, tptr_stack, blocks,
                        u_offs, nbuf_k, max_block, interpret,
                        out_transposed, base_tile: int = 0):
    k_chunks = len(vqs)
    d = vu_full.shape[0]
    n_tiles = tptr_stack.shape[1] - 1
    n_pad = n_tiles * TILE_N
    if out_transposed:
        out_spec = pl.BlockSpec((d, TILE_N), lambda t, ptr: (0, t),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((d, n_pad), jnp.float32)
        acc_shape = (d, TILE_N)
    else:
        out_spec = pl.BlockSpec((TILE_N, d), lambda t, ptr: (t, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, d), jnp.float32)
        acc_shape = (TILE_N, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        * (1 + 3 * k_chunks),
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM((k_chunks, nbuf_k, d, max_block), vu_full.dtype),
            pltpu.VMEM((k_chunks, nbuf_k, max_block // SUB, 128),
                       jnp.int32),
            pltpu.SemaphoreType.DMA((k_chunks, nbuf_k, 2)),
            pltpu.SMEM((2 * k_chunks,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _make_segsum3_multi_kernel(out_transposed, tuple(blocks),
                                   tuple(u_offs), nbuf_k,
                                   base_tile=base_tile),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tptr_stack, vu_full, *vqs, *vis, *ids_list)


_NEG = -3.0e38


def _segmax_kernel(tile_ptr_ref, scores_hbm, ids_hbm, out_ref, acc, vbuf,
                   nbuf, sems, *, block):
    """Per-node-tile segment MAX of a scalar score stream (the GAT
    destination-softmax stabilizer, Models/GnnLayers.py:112 edge_softmax).

    Unlike the sum kernel there is no MXU trick for max; per 128-entry
    sub-chunk the ids/scores tiles are transposed once ([nsub, 128] →
    [128, nsub]) so entries sit on SUBLANES, then a [SUB, TILE_N] masked
    compare + sublane max-reduce lands the per-node maxima directly in
    the [1, TILE_N] lane layout. ~1 vector op per entry — far from the
    sum kernel's MXU rate but cheap at GAT scale. Nodes with no entries
    (or only sentinel ids) read -3e38."""
    nsub = block // SUB
    t = pl.program_id(0)
    start = tile_ptr_ref[t]
    end = tile_ptr_ref[t + 1]
    node_base = t * TILE_N

    g0 = start // block
    g1 = jnp.where(end > start, (end - 1) // block, g0 - 1)

    acc[...] = jnp.full_like(acc, _NEG)

    def body(g, _):
        svdma = pltpu.make_async_copy(
            scores_hbm.at[pl.ds(g * nsub, nsub), :], vbuf, sems.at[0])
        iddma = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(g * nsub, nsub), :], nbuf, sems.at[1])
        svdma.start()
        iddma.start()
        svdma.wait()
        iddma.wait()
        ids_t = jnp.swapaxes(nbuf[...], 0, 1)      # [128, nsub]
        scr_t = jnp.swapaxes(vbuf[...], 0, 1)
        for j in range(nsub):
            local = ids_t[:, j:j + 1] - node_base            # [SUB, 1]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (SUB, TILE_N), 1)
                  == local)
            masked = jnp.where(oh, jnp.broadcast_to(scr_t[:, j:j + 1],
                                                    (SUB, TILE_N)), _NEG)
            acc[...] = jnp.maximum(acc[...],
                                   jnp.max(masked, axis=0, keepdims=True))
        return 0

    jax.lax.fori_loop(g0, g1 + 1, body, 0, unroll=False)
    # the out block is (1, 8, TILE_N): real Mosaic rejects sub-8 sublane
    # blocks, so each tile broadcasts its [1, TILE_N] row across 8
    # sublanes (the caller reads plane 0)
    out_ref[...] = jnp.broadcast_to(acc[...].reshape(1, 1, TILE_N),
                                    (1, 8, TILE_N))


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret",
                                             "block"))
def csr_segment_max_t(scores_2d: jnp.ndarray, segment_ids_2d: jnp.ndarray,
                      tile_ptr: jnp.ndarray, num_segments: int,
                      interpret: bool = False,
                      block: int = BLOCK) -> jnp.ndarray:
    """Sorted segment-max over a scalar stream.

    scores_2d: [K_pad/128, 128] f32 (the flat [K_pad] stream pre-reshaped
    like the ids — a [1, K_pad] row cannot legally re-tile to sublanes
    inside the kernel). Returns [1, n_pad] f32 (n_pad = tiles * TILE_N);
    empty segments hold -3e38."""
    assert scores_2d.shape == segment_ids_2d.shape, (
        scores_2d.shape, segment_ids_2d.shape)
    n_tiles = tile_ptr.shape[0] - 1
    nsub = block // SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec((1, 8, TILE_N), lambda t, ptr: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, TILE_N), jnp.float32),
            pltpu.VMEM((nsub, 128), jnp.float32),
            pltpu.VMEM((nsub, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segmax_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, TILE_N), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_ptr, scores_2d, segment_ids_2d)
    return out[:, 0, :].reshape(1, n_tiles * TILE_N)


def csr_segment_sum(values: jnp.ndarray, segment_ids_2d: jnp.ndarray,
                    tile_ptr: jnp.ndarray, num_segments: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Row-major convenience wrapper: transposes [K_pad, d] → [d, K_pad]."""
    return csr_segment_sum_t(values.T, segment_ids_2d, tile_ptr, num_segments,
                             interpret=interpret)


def prepare_segment_inputs(values: jnp.ndarray, segment_ids: np.ndarray,
                           num_segments: int):
    """Host-side packing: pad values/ids to BLOCK multiples, reshape ids to
    [K_pad/128, 128], compute tile_ptr. ``segment_ids`` must be sorted
    ascending (static graph structure)."""
    k = values.shape[0]
    k_pad = _round_up(max(k, 1), BLOCK)
    ids = np.asarray(segment_ids, np.int32)
    ids_pad = np.concatenate([ids, np.full(k_pad - k, 2**31 - 1, np.int32)])
    tile_ptr, _ = pack_csr_tiles(ids, num_segments)
    ids_2d = ids_pad.reshape(-1, 128)
    if k_pad != k:
        pad = jnp.zeros((k_pad - k, values.shape[1]), values.dtype)
        values = jnp.concatenate([values, pad], axis=0)
    return values, jnp.asarray(ids_2d), jnp.asarray(tile_ptr)
