"""Pallas TPU kernel: sorted CSR segment-sum via VPU scan + butterfly place.

The one-hot MXU segment-sum (ops/pallas/segsum.py) pays ~160 weight-load
cycles per 128 entries — the matmul array is M-starved at d=32, so the
one-hot weight load never amortizes. This variant replaces each one-hot
with pure VPU work on the same [d, 128] sub-blocks:

  1. sort     — a host-routed Beneš butterfly (13 roll+select stages)
                restores node-major order within the sub-block (the Clos
                stage-2 fusion in ops/packing.py leaves entries shuffled
                within DMA blocks);
  2. scan     — 7-stage Hillis-Steele segmented prefix sum with
                precomputed run-continuation masks: run-end lanes hold
                their run's within-block total;
  3. place    — a second butterfly moves each valid run-end total to
                lane (node - tile_base); invalid lanes carry zeros and
                land on non-target lanes (the extension to a full
                permutation is bijective), so a plain add accumulates.

~65 VPU cycles per 128 entries vs ~160+ MXU — and exact in f32 (pure
data movement + f32 adds; the one-hot path needs a bf16 hi/lo split).

Streams per entry: values (d x itemsize) + two packed int32 words:

  w1: sort-butterfly switches [0,13) | scan masks [13,20) | valid [20]
  w2: place-butterfly switches [0,13)

Words are packed PER (tile, block): a DMA block straddling a node-tile
boundary is consumed by both tiles with different valid masks and
placements, so its words appear once per consuming tile (the value
stream stays global; word blocks are still globally sequential, so the
same streaming-prefetch structure covers them). Host packing:
``pack_scan_inputs`` (NumPy + the native butterfly router).

Reference counterpart: torch_sparse CUDA scatter
(/root/reference/Models/GnnLayers.py:233); same contract as
segsum.csr_segment_sum_t(out_transposed=True).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.ops.pallas.segsum import BLOCK, NSUB, SUB, TILE_N, _round_up

NBUF = 4
BFLY_STAGES = 13
BFLY_SHIFTS = (64, 32, 16, 8, 4, 2, 1, 2, 4, 8, 16, 32, 64)
SCAN_SHIFT0 = BFLY_STAGES           # w1 bit offset of the 7 scan masks
VALID_BIT = BFLY_STAGES + 7         # w1 bit of the run-end validity flag


class ScanSegPack(NamedTuple):
    """Device operands for ``csr_segment_scan_t`` (host-packed once)."""
    w1: jnp.ndarray        # [KW/128, 128] int32
    w2: jnp.ndarray        # [KW/128, 128] int32
    wptr: jnp.ndarray      # [T+1] int32 — word BLOCK base per tile
    tile_ptr: jnp.ndarray  # [T+1] int32 — value entry offsets (segsum rule)
    n_pad: int


def pack_scan_inputs(ids: np.ndarray, num_segments: int) -> ScanSegPack:
    """ids: [K_pad] int32 node ids of the value stream (K_pad % BLOCK == 0;
    sorted at BLOCK granularity, arbitrary order within a block; sentinel
    int32-max on padding). Packs the per-(tile, block) word streams."""
    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.bfly import route_blocks as py_route
    from ihgnn_tpu.ops.pallas.segsum import pack_csr_tiles

    ids = np.asarray(ids, np.int64)
    k_pad = ids.shape[0]
    assert k_pad % BLOCK == 0, k_pad
    # tile_ptr over the REAL (non-sentinel) prefix, as in the segsum pack.
    # Entries are only block-sorted (stage-2 fusion shuffles within DMA
    # blocks), so sort before the searchsorted — block membership of the
    # rank boundaries is shuffle-invariant, which is all the kernel needs.
    real = np.sort(ids[ids < 2**31 - 1])
    tile_ptr, n_pad = pack_csr_tiles(real.astype(np.int32), num_segments)
    n_tiles = n_pad // TILE_N
    total_blocks = k_pad // BLOCK

    # per-tile consumed block ranges [g0, g1] (inclusive); empty tiles
    # still consume one block (their g0) to keep the kernel loop simple
    starts = tile_ptr[:-1].astype(np.int64)
    ends = tile_ptr[1:].astype(np.int64)
    g0 = np.minimum(starts // BLOCK, total_blocks - 1)
    g1 = np.where(ends > starts, (ends - 1) // BLOCK, g0)
    g1 = np.minimum(g1, total_blocks - 1)
    nblk = (g1 - g0 + 1).astype(np.int64)
    wptr = np.zeros(n_tiles + 1, np.int64)
    np.cumsum(nblk, out=wptr[1:])

    # gather every (tile, block) pair's sub-block id groups
    tile_of = np.repeat(np.arange(n_tiles), nblk)
    gblk = np.concatenate([np.arange(a, b + 1) for a, b in zip(g0, g1)]) \
        if n_tiles else np.zeros(0, np.int64)
    kw = wptr[-1]                                  # word blocks
    # [KW, NSUB, SUB] ids per word sub-block
    sub_ids = ids.reshape(-1, NSUB, SUB)[gblk]
    base = (tile_of * TILE_N)[:, None, None]

    order = np.argsort(sub_ids, axis=2, kind="stable")
    sorted_ids = np.take_along_axis(sub_ids, order, axis=2)

    # scan masks: continuation of the run at distance 2^s (sorted order)
    masks = np.zeros(sub_ids.shape, np.int32)
    for s in range(7):
        m = 1 << s
        cont = sorted_ids[:, :, m:] == sorted_ids[:, :, :-m]
        masks[:, :, m:] |= cont.astype(np.int32) << s
    run_end = np.ones(sub_ids.shape, bool)
    run_end[:, :, :-1] = sorted_ids[:, :, 1:] != sorted_ids[:, :, :-1]
    valid = run_end & (sorted_ids >= base) & (sorted_ids < base + TILE_N)

    # placement: valid run-end at sorted lane k -> lane (id - base);
    # extend to a full permutation (remaining sources -> remaining lanes)
    targets = np.where(valid, sorted_ids - base, -1)
    place = np.empty(sub_ids.shape, np.int64)
    flat_t = targets.reshape(-1, SUB)
    flat_p = place.reshape(-1, SUB)
    lanes = np.arange(SUB)
    for i in range(flat_t.shape[0]):
        t = flat_t[i]
        used_out = t[t >= 0]
        pp = np.full(SUB, -1, np.int64)
        pp[used_out] = lanes[t >= 0]
        free_out = pp < 0
        free_in = np.setdiff1d(lanes, lanes[t >= 0], assume_unique=False)
        pp[free_out] = free_in
        flat_p[i] = pp

    def _route(perms2d):
        # single-network 13-bit Beneš words per 128-lane block (NOT the
        # two-stage route_rows_bfly packing)
        w = native.bfly_route_blocks(perms2d.astype(np.int32))
        if w is None:
            w = py_route(perms2d)
        return w

    sort_bits = _route(order.reshape(-1, SUB)).reshape(sub_ids.shape)
    place_bits = _route(place.reshape(-1, SUB)).reshape(sub_ids.shape)

    w1 = (sort_bits | (masks << SCAN_SHIFT0)
          | (valid.astype(np.int32) << VALID_BIT)).astype(np.int32)
    w2 = place_bits.astype(np.int32)
    return ScanSegPack(
        w1=jnp.asarray(w1.reshape(-1, SUB)),
        w2=jnp.asarray(w2.reshape(-1, SUB)),
        wptr=jnp.asarray(wptr.astype(np.int32)),
        tile_ptr=jnp.asarray(tile_ptr),
        n_pad=int(n_pad),
    )


def _bfly_apply_1b(x, bits):
    """13 butterfly stages along the lane axis of x [d, SUB]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
    for t, m in enumerate(BFLY_SHIFTS):
        hi = (lane & m) != 0
        sw = ((bits >> t) & 1) != 0
        partner = jnp.where(hi, pltpu.roll(x, m, 1),
                            pltpu.roll(x, SUB - m, 1))
        x = jnp.where(sw, partner, x)
    return x


def _segscan_kernel(tile_ptr_ref, wptr_ref, values_t_hbm, w1_hbm, w2_hbm,
                    out_ref, acc, vbuf, w1buf, w2buf, sems, ctr):
    """Same global streaming-prefetch structure as segsum._segsum_kernel;
    ctr = [v_fetched, v_waited, w_fetched, w_waited]."""
    t = pl.program_id(0)
    start = tile_ptr_ref[t]
    end = tile_ptr_ref[t + 1]
    total_blocks = values_t_hbm.shape[1] // BLOCK
    total_wblocks = w1_hbm.shape[0] // NSUB

    g0 = jnp.minimum(start // BLOCK, total_blocks - 1)
    g1 = jnp.where(end > start,
                   jnp.minimum((end - 1) // BLOCK, total_blocks - 1), g0)
    wb0 = wptr_ref[t]

    @pl.when(t == 0)
    def _():
        ctr[0] = 0
        ctr[1] = 0
        ctr[2] = 0
        ctr[3] = 0

    def vdma(g):
        return pltpu.make_async_copy(
            values_t_hbm.at[:, pl.ds(pl.multiple_of(g * BLOCK, BLOCK),
                                     BLOCK)],
            vbuf.at[jax.lax.rem(g, NBUF)],
            sems.at[jax.lax.rem(g, NBUF), 0])

    def wdma(wg):
        slot = jax.lax.rem(wg, NBUF)
        return (pltpu.make_async_copy(w1_hbm.at[pl.ds(wg * NSUB, NSUB), :],
                                      w1buf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(w2_hbm.at[pl.ds(wg * NSUB, NSUB), :],
                                      w2buf.at[slot], sems.at[slot, 2]))

    acc[...] = jnp.zeros_like(acc)

    def body(g, _):
        wg = wb0 + (g - g0)
        # value stream: global prefetch window (blocks re-read across
        # boundary tiles stay resident in their slot)
        tgt = jnp.minimum(g + NBUF - 1, total_blocks - 1)

        def vfetch(gg, _):
            vdma(gg).start()
            return 0

        fetched = ctr[0]
        jax.lax.fori_loop(jnp.maximum(fetched, g), tgt + 1, vfetch, 0)
        ctr[0] = jnp.maximum(fetched, tgt + 1)

        def vwait(gg, _):
            vdma(gg).wait()
            return 0

        waited = ctr[1]
        jax.lax.fori_loop(jnp.maximum(waited, g), g + 1, vwait, 0)
        ctr[1] = jnp.maximum(waited, g + 1)

        # word stream: consumed exactly once, also globally sequential
        wtgt = jnp.minimum(wg + NBUF - 1, total_wblocks - 1)

        def wfetch(gg, _):
            for d in wdma(gg):
                d.start()
            return 0

        wfetched = ctr[2]
        jax.lax.fori_loop(jnp.maximum(wfetched, wg), wtgt + 1, wfetch, 0)
        ctr[2] = jnp.maximum(wfetched, wtgt + 1)

        def wwait(gg, _):
            for d in wdma(gg):
                d.wait()
            return 0

        wwaited = ctr[3]
        jax.lax.fori_loop(jnp.maximum(wwaited, wg), wg + 1, wwait, 0)
        ctr[3] = jnp.maximum(wwaited, wg + 1)

        vslot = jax.lax.rem(g, NBUF)
        wslot = jax.lax.rem(wg, NBUF)
        for j in range(NSUB):
            w1 = w1buf[wslot][j].reshape(1, SUB)
            w2 = w2buf[wslot][j].reshape(1, SUB)
            v = vbuf[vslot][:, j * SUB:(j + 1) * SUB].astype(jnp.float32)
            x = _bfly_apply_1b(v, w1)               # sorted order
            for s in range(7):                      # segmented prefix sum
                m = 1 << s
                cont = ((w1 >> (SCAN_SHIFT0 + s)) & 1) != 0
                x = x + jnp.where(cont, pltpu.roll(x, m, 1), 0.0)
            valid = ((w1 >> VALID_BIT) & 1) != 0
            placed = _bfly_apply_1b(jnp.where(valid, x, 0.0), w2)
            acc[...] += placed
        return 0

    jax.lax.fori_loop(g0, g1 + 1, body, 0, unroll=False)

    # drain pending DMAs at the end of the grid (see segsum kernel)
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def vfin(gg, _):
            vdma(gg).wait()
            return 0

        jax.lax.fori_loop(ctr[1], ctr[0], vfin, 0)

        def wfin(gg, _):
            for d in wdma(gg):
                d.wait()
            return 0

        jax.lax.fori_loop(ctr[3], ctr[2], wfin, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "interpret"))
def csr_segment_scan_t(values_t: jnp.ndarray, pack: ScanSegPack,
                       num_segments: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Feature-major sorted segment-sum via scan+place. Same contract as
    segsum.csr_segment_sum_t(..., out_transposed=True): values_t [d, K_pad]
    (K_pad % BLOCK == 0, ids consistent with the pack), returns [d, N] f32.
    """
    d, k_pad = values_t.shape
    assert k_pad % BLOCK == 0, k_pad
    n_tiles = pack.tile_ptr.shape[0] - 1
    n_pad = n_tiles * TILE_N

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((d, TILE_N), lambda t, p1, p2: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, TILE_N), jnp.float32),
            pltpu.VMEM((NBUF, d, BLOCK), values_t.dtype),
            pltpu.VMEM((NBUF, NSUB, SUB), jnp.int32),
            pltpu.VMEM((NBUF, NSUB, SUB), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _segscan_kernel,
        out_shape=jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pack.tile_ptr, pack.wptr, values_t, pack.w1, pack.w2)
    return out[:, :num_segments]
