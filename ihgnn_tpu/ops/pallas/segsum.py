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
BLOCK = 1024    # entries per DMA block (= 8 * SUB)
NSUB = BLOCK // SUB
NBUF = 4        # DMA pipeline depth (blocks in flight)


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


def _make_segsum_kernel(out_transposed: bool):
    def kernel(*args):
        _segsum_kernel(*args, out_transposed=out_transposed)
    return kernel


def _segsum_kernel(tile_ptr_ref, values_t_hbm, ids_hbm, out_ref, acc, vbuf,
                   nbuf, sems, out_transposed=False):
    t = pl.program_id(0)
    start = tile_ptr_ref[t]
    end = tile_ptr_ref[t + 1]
    node_base = t * TILE_N

    aligned = (start // BLOCK) * BLOCK
    num_blocks = pl.cdiv(end - aligned, BLOCK)
    acc[...] = jnp.zeros_like(acc)

    def dmas(slot, bi):
        off = aligned + bi * BLOCK
        idrow = off // 128
        return (
            pltpu.make_async_copy(values_t_hbm.at[:, pl.ds(off, BLOCK)],
                                  vbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(ids_hbm.at[pl.ds(idrow, NSUB), :],
                                  nbuf.at[slot], sems.at[slot, 1]),
        )

    def warm(bi, _):
        @pl.when(bi < num_blocks)
        def _():
            for d in dmas(bi, bi):
                d.start()
        return 0

    jax.lax.fori_loop(0, NBUF, warm, 0, unroll=True)

    def body(bi, _):
        slot = jax.lax.rem(bi, NBUF)
        for d in dmas(slot, bi):
            d.wait()

        block_off = aligned + bi * BLOCK
        for j in range(NSUB):
            nodes = nbuf[slot][j].reshape(1, SUB)
            k = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
            global_k = block_off + j * SUB + k
            valid = (global_k >= start) & (global_k < end)
            local = jnp.where(valid, nodes - node_base, TILE_N)  # TILE_N=drop
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (TILE_N, SUB), 0)
                      == local).astype(jnp.bfloat16)
            # two-pass bf16 hi/lo split: ~f32 accuracy at 2 MXU passes
            # (vs 6 for Precision.HIGHEST); the one-hot side is exact
            v = vbuf[slot][:, j * SUB:(j + 1) * SUB]
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            for part in (vhi, vlo):
                if out_transposed:
                    # acc [d, TILE_N] += v [d, SUB] · onehotᵀ
                    acc[...] += jax.lax.dot_general(
                        part, onehot, dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
                else:
                    acc[...] += jax.lax.dot_general(
                        onehot, part, dimension_numbers=dims,
                        preferred_element_type=jnp.float32)

        # refill the slot just consumed with the block NBUF ahead
        @pl.when(bi + NBUF < num_blocks)
        def _():
            for d in dmas(slot, bi + NBUF):
                d.start()
        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0, unroll=False)
    out_ref[...] = acc[...]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "interpret",
                                    "out_transposed"))
def csr_segment_sum_t(values_t: jnp.ndarray, segment_ids_2d: jnp.ndarray,
                      tile_ptr: jnp.ndarray, num_segments: int,
                      interpret: bool = False,
                      out_transposed: bool = False) -> jnp.ndarray:
    """Sorted segment-sum over feature-major values.

    Args:
      values_t: [d, K_pad] — entry rows to sum (feature-major), sorted by
        segment id along axis 1, K_pad a multiple of BLOCK.
      segment_ids_2d: [K_pad / 128, 128] int32 sorted ids.
      tile_ptr: [T+1] int32 from ``pack_csr_tiles``.
      num_segments: unpadded segment count N.
      out_transposed: return [d, N] (feature-major, lane-packing friendly)
        instead of [N, d].
    Returns [N, d] sums ([d, N] when out_transposed).
    """
    d, k_pad = values_t.shape
    assert k_pad % BLOCK == 0, k_pad
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM((NBUF, d, BLOCK), jnp.float32),
            pltpu.VMEM((NBUF, NSUB, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_segsum_kernel(out_transposed),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_ptr, values_t, segment_ids_2d)
    return out[:, :num_segments] if out_transposed else out[:num_segments]


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
