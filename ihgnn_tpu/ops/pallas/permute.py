"""Pallas stage kernels for Clos/Beneš-routed static permutations.

Executes ``out = x[:, perm]`` for feature-major [d, E] arrays via the
rectangular three-stage factorization from ops/benes.py / csrc/routing.cc
(E = R*C viewed as an [R, C] row-major grid):

  row_local_permute — out[:, r, c] = x[:, r, p[r, c]]; per (row, 128-col
                      output chunk) one-hot MXU matmul — no gathers, no
                      data-dependent addressing.
  block_transpose   — out[:, a, b] = x[:, b, a]; tiled [T, T] transposes
                      (rectangular grids supported).

Together: 5 array passes (3 local + 2 transpose) at near-HBM bandwidth,
replacing XLA's serial gather lowering (~60 ms per 2M-column gather on
v5e). This is the TPU-native counterpart of the reference's reliance on
CUDA gather/scatter inside torch_sparse (Models/GnnLayers.py:233).

Shape contract (set by pick_grid): C a multiple of 128 (output chunking +
transpose tiles), R a multiple of 128 (transpose tiles; also covers the
sublane blocking of the middle stage, which runs row-locally on the
transposed [C, R] grid).
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # rows per program (f32 sublane tile)
CHUNK = 128       # output columns per one-hot matmul (MXU lane width)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_grid(e: int, c: int = 1024, force_c: bool = False
              ) -> Tuple[int, int]:
    """[R, C] grid for an E-element permutation: C a power of two (Euler
    coloring), R a multiple of 128 (transpose tiling). E pads to R*C.

    Default heuristic caps C near sqrt(E) (squarish grids). ``force_c``
    keeps the requested C (only shrinking when R would fall below one
    128-row transpose tile) — wide grids SHORTEN the transposed mid
    stage's rows, cutting the dg exchange mux ~linearly in R/128
    (docs/STEP_ACCOUNTING.json: the mux tree is ~80% of each stage pass).
    """
    if not force_c:
        c = min(c, max(128, 1 << (e.bit_length() // 2)))
    while c > 128 and -(-e // c) <= 64:     # keep at least half a row tile
        c //= 2
    r = _round_up(-(-e // c), 128)
    return r, c


def _local_permute_kernel(x_ref, p_ref, o_ref):
    """Block [d, ROWS, C] + perms [ROWS, C] → permuted block.

    One one-hot matmul per (row, CHUNK output columns): onehot[cc, k] =
    (p[r, j*CHUNK + k] == cc), out_chunk = x_row · onehot.

    f32 values use the bf16 hi/lo split (~f32 accuracy, CLAUDE.md),
    M-packed: hi and lo stack along the feature axis into one [2d, C]
    operand, so both halves ride a single MXU pass (M = 2d ≤ 128 is free
    — the array is M-underutilized at d = 32 anyway). bf16 values need no
    split: a permutation one-hot selects exactly one bf16 value per
    output, and bf16·1 products accumulate exactly in f32."""
    d, rows, c = x_ref.shape
    bf16_in = x_ref.dtype == jnp.bfloat16
    for r in range(rows):
        x = x_ref[:, r, :]                       # [d, C]
        if bf16_in:
            xs = x
        else:
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            xs = jnp.concatenate([xhi, xlo], axis=0)  # [2d, C]
        for j in range(c // CHUNK):
            p = p_ref[r, j * CHUNK:(j + 1) * CHUNK].reshape(1, CHUNK)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (c, CHUNK), 0)
                      == p).astype(jnp.bfloat16)
            both = jnp.dot(xs, onehot, preferred_element_type=jnp.float32)
            out = both if bf16_in else both[:d] + both[d:]
            o_ref[:, r, j * CHUNK:(j + 1) * CHUNK] = out.astype(o_ref.dtype)


def _rlp_rows(d: int, r: int, c: int, dtype) -> int:
    """Block row count: respect the dtype's sublane tile (f32 (8,128),
    bf16 (16,128) — CLAUDE.md) and shrink for very long rows so the
    double-buffered in+out blocks stay well inside scoped VMEM (stress
    grids reach C ~10k: a 16-row bf16 block is 10 MB)."""
    rows = min(16 if dtype == jnp.bfloat16 else ROWS, r)
    isz = jnp.dtype(dtype).itemsize
    min_rows = 16 if dtype == jnp.bfloat16 else 8
    while rows > min_rows and d * rows * c * isz > (8 << 20):
        rows //= 2
    return rows


# stage blocks scale with the grid's C; the Mosaic default scoped-VMEM
# limit (16 MB) rejects stress-scale rows, so every stage kernel raises it
_RLP_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute(x: jnp.ndarray, p: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; p: [R, C] int32 → out[:, r, c] = x[:, r, p[r, c]]."""
    d, r, c = x.shape
    assert p.shape == (r, c), (p.shape, x.shape)
    rows = _rlp_rows(d, r, c, x.dtype)
    assert r % rows == 0 and c % CHUNK == 0, (r, c)
    return pl.pallas_call(
        _local_permute_kernel,
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(x, p)


_MXU_SWAP = os.environ.get("IHGNN_MXU_SWAP", "1") == "1"


def _eye128(dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            ).astype(dtype)


def _mxu_swap_ok(x) -> bool:
    """bf16 [d, 128, 128] blocks can transpose on the MXU: xᵀ =
    dot_general(x, I, contracting dim 0 of both) selects exactly one bf16
    value per output (exact; f32 operands would round to bf16 — VPU path
    for those). In VPU-bound kernels (tlp_dg_pre at 4.85 ms vs the
    ~2.0 ms Pallas DMA roof, docs/PALLAS_COPY_PROBE.json) this frees the
    VPU for the gather/mux work the transpose otherwise serializes with;
    the MXU is idle there."""
    return (_MXU_SWAP and x.dtype == jnp.bfloat16
            and x.shape[1] == 128 and x.shape[2] == 128)


# fraction of the d slices transposed on the MXU; the rest run the VPU
# swap CONCURRENTLY (both units work the same block). Measured balance:
# MXU ~0.31 us/slice vs VPU ~0.53 — ~0.6 equalizes. Full-MXU measured
# SLOWER than VPU in transpose-only chunk programs (serialized dots).
_MXU_SWAP_FRAC = float(os.environ.get("IHGNN_MXU_SWAP_FRAC", "0.625"))


def _mxu_swap_store(o_ref, x):
    """o_ref[...] = swapaxes(x, 1, 2) with the d slices split between
    MXU identity dots and the VPU swap so the two units overlap (caller
    checks _mxu_swap_ok)."""
    d = x.shape[0]
    n_mxu = max(0, min(d, int(round(d * _MXU_SWAP_FRAC))))
    eye = _eye128(x.dtype)
    for dd in range(n_mxu):
        o_ref[dd] = jax.lax.dot_general(
            x[dd], eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    if n_mxu < d:
        o_ref[n_mxu:] = jnp.swapaxes(x[n_mxu:], 1, 2)


def _transpose_kernel(x_ref, o_ref):
    # in block [d, T, T] from grid (i, j) reads (j, i); swap of minor dims
    o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def block_transpose(x: jnp.ndarray, tile: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C] → [d, C, R] (out[:, a, b] = x[:, b, a])."""
    d, r, c = x.shape
    assert r % tile == 0 and c % tile == 0, (r, c, tile)
    return pl.pallas_call(
        _transpose_kernel,
        grid=(c // tile, r // tile),
        in_specs=[pl.BlockSpec((d, tile, tile), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, tile, tile), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x.dtype),
        interpret=interpret,
    )(x)


def _tlp_compute(xv, p_ref, o_ref, y_ref):
    """Shared TLP compute: from x tile ``xv`` [d, RT, C] build this chunk's
    transposed output block. One one-hot matmul per row writes the row's
    output chunk into row-major scratch y [d, RT, CHUNK]; a single in-VMEM
    swapaxes transposes it for the store."""
    d, rt, c = xv.shape
    chunk = o_ref.shape[1]
    bf16_in = xv.dtype == jnp.bfloat16
    for r in range(rt):
        x = xv[:, r, :]
        if bf16_in:
            xs = x
        else:
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            xs = jnp.concatenate([xhi, xlo], axis=0)
        p = p_ref[r, :].reshape(1, chunk)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (c, chunk), 0)
                  == p).astype(jnp.bfloat16)
        both = jnp.dot(xs, onehot, preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        y_ref[:, r, :] = out.astype(y_ref.dtype)
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


def _tlp_kernel_hbm(x_hbm, p_ref, o_ref, xv, y_ref, sem):
    """TLP with x left in HBM: the [d, RT, C] row tile is DMA'd into a
    SINGLE-buffered VMEM scratch once per row-tile (at the first chunk of
    the c-chunk grid axis). Mosaic double-buffers every pipelined input
    block whose index map is non-constant — for an 8 MB x tile that alone
    blows the 16 MB scoped-VMEM limit (observed on-chip: 19.1 MB for d=32,
    C=1024 bf16) — so the tile must be fetched manually. The stall is one
    ~10 us DMA per RT rows, amortized over C/CHUNK grid cells of MXU work."""
    i = pl.program_id(1)                    # chunk axis, iterates fastest
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * TLP_RT, TLP_RT), :], xv, sem)
        dma.start()
        dma.wait()

    _tlp_compute(xv, p_ref, o_ref, y_ref)


def _tlp_kernel(x_ref, p_ref, o_ref, y_ref):
    """TLP with a pipelined (auto-double-buffered) x block — only safe for
    small tiles; see _tlp_kernel_hbm."""
    _tlp_compute(x_ref, p_ref, o_ref, y_ref)


# input row-tile height of the fused kernel = output minor-dim tile (the
# out block's minor axis is the input row axis, so it must be 128-wide)
TLP_RT = 128
# Scoped-VMEM budget: v5e has 128 MB VMEM/core; Mosaic's DEFAULT scoped
# limit is only 16 MB, so the pallas_call raises it via
# CompilerParams(vmem_limit_bytes) and the plan checks against the raised
# budget (generous slack for compute temporaries + internal scratch).
_TLP_BUDGET = 96 << 20


def _tlp_plan(d: int, c: int, dtype) -> str | None:
    """Pick the TLP variant whose VMEM footprint fits: 'auto' (pipelined x,
    double-buffered — overlaps the next row-tile's 8 MB fetch with compute)
    when it fits, 'hbm' (manual single-buffered fetch) for tiles past half
    the budget, None when even that exceeds it."""
    isz = jnp.dtype(dtype).itemsize
    x_tile = d * TLP_RT * c * isz
    fixed = (2 * d * CHUNK * TLP_RT * isz      # out block, double-buffered
             + d * TLP_RT * CHUNK * isz        # y scratch
             + 2 * TLP_RT * CHUNK * 4)         # p block, double-buffered
    if 2 * x_tile + fixed <= _TLP_BUDGET:
        return "auto"
    if x_tile + fixed <= _TLP_BUDGET:
        return "hbm"
    return None


def tlp_vmem_ok(d: int, c: int, dtype) -> bool:
    """Whether some TLP variant fits the scoped-VMEM budget."""
    return _tlp_plan(d, c, dtype) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def transposed_local_permute(x: jnp.ndarray, p: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; p: [R, C] int32 → out [d, C, R] with
    out[:, c, r] = x[:, r, p[r, c]]  (= block_transpose(row_local_permute))."""
    d, r, c = x.shape
    assert p.shape == (r, c), (p.shape, x.shape)
    assert r % TLP_RT == 0 and c % CHUNK == 0, (r, c)
    plan = _tlp_plan(d, c, x.dtype)
    assert plan is not None, (d, c, x.dtype)
    common = dict(
        grid=(r // TLP_RT, c // CHUNK),
        out_specs=pl.BlockSpec((d, CHUNK, TLP_RT), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TLP_BUDGET + (16 << 20)),
        interpret=interpret,
    )
    p_spec = pl.BlockSpec((TLP_RT, CHUNK), lambda j, i: (j, i),
                          memory_space=pltpu.VMEM)
    if plan == "auto":
        return pl.pallas_call(
            _tlp_kernel,
            in_specs=[pl.BlockSpec((d, TLP_RT, c), lambda j, i: (0, j, 0),
                                   memory_space=pltpu.VMEM), p_spec],
            scratch_shapes=[pltpu.VMEM((d, TLP_RT, CHUNK), x.dtype)],
            **common,
        )(x, p)
    return pl.pallas_call(
        _tlp_kernel_hbm,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), p_spec],
        scratch_shapes=[pltpu.VMEM((d, TLP_RT, c), x.dtype),
                        pltpu.VMEM((d, TLP_RT, CHUNK), x.dtype),
                        pltpu.SemaphoreType.DMA],
        **common,
    )(x, p)


# ---------------------------------------------------------------------------
# Long-row flat permute via int8 byte planes.
#
# At stress scale the Clos middle stage has rows of ~10k lanes (B = C/128
# ~ 77): the hier kernels' cross-block exchange is O(B^2) VMEM traffic
# (measured 83 ms vs flat's 47.2 at [32, 1024, 9856] bf16) so long rows
# run the FLAT one-hot — which is MXU-bound. A permutation one-hot selects
# exactly ONE source per output, so the dot can run on raw value BYTES:
# split bf16 into two (byte - 128) int8 planes stacked on M, build the
# one-hot in int8, and recombine the int32 results by shifts. Wins
# measured at [32, 1024, 9856] (tools/probe_longrow.py):
#   * int8 doubles the MXU K-stream rate, and M = 2d = 64 packs the
#     array twice as full: 26.1 ms/pass vs 47.2 bf16 — exact, not approx;
#   * grid over (row-tile, chunk) with one dot per cell keeps the Mosaic
#     program tiny: ~80 s compile vs ~15 min for the unrolled bf16 kernel.
# The byte planes are packed IN-kernel right after the row-tile DMA (VPU
# shifts, no extra HBM round-trip). f32 streams use four planes (M = 128,
# same exactness argument). Padding tail columns are real positions of the
# padded grid (identity-routed), so every output still selects exactly one
# source.
# ---------------------------------------------------------------------------

INT8_RT = 16      # rows per tile (int8 scratch keeps (32, 128) tiling ok)


def byte_plane_count(dtype) -> int:
    return 2 if dtype == jnp.bfloat16 else 4


def pack_byte_planes(v: jnp.ndarray) -> jnp.ndarray:
    """[d, ...] bf16/f32 → [n_planes*d, ...] int8 of (byte - 128) planes,
    most-significant first (in-kernel helper: VPU shifts only)."""
    d = v.shape[0]
    n_planes = byte_plane_count(v.dtype)
    if n_planes == 2:
        u = jax.lax.bitcast_convert_type(v, jnp.uint16).astype(jnp.int32)
    else:
        u = jax.lax.bitcast_convert_type(v, jnp.uint32).astype(jnp.int32)
    planes = [((u >> (8 * (n_planes - 1 - pi))) & 255) - 128
              for pi in range(n_planes)]
    return jnp.concatenate(planes, axis=0).astype(jnp.int8)


def recombine_byte_planes(planes_i32: jnp.ndarray, d: int,
                          out_dtype) -> jnp.ndarray:
    """[n_planes*d, ...] int32 of selected (byte - 128) plane values →
    [d, ...] out_dtype by byte recombination (exact bit transport)."""
    n_planes = planes_i32.shape[0] // d
    b = planes_i32 + 128
    acc = b[:d].astype(jnp.uint32)
    for pi in range(1, n_planes):
        acc = (acc << 8) | b[pi * d:(pi + 1) * d].astype(jnp.uint32)
    if out_dtype == jnp.bfloat16:
        return jax.lax.bitcast_convert_type(acc.astype(jnp.uint16),
                                            jnp.bfloat16)
    return jax.lax.bitcast_convert_type(acc, jnp.float32)


def _i8_kernel(x_hbm, p_ref, o_ref, xv, xs, sem):
    """Round-2 production form: row-tile DMA + in-kernel byte-plane pack.

    Byte-plane HANDLING is shape-fragile in both compilers (all measured
    round 3): this form runs 26.1 ms/pass at [32, 1024, 9856] (the shape
    the production cols=1024 stress grid produces — proven inside the
    1312 ms round-2 stress step) but 3279 ms at [32, 2048, 4992]; the
    standalone XLA pack with its axis-0 int8 concat costs 2867 ms at the
    latter shape (17.4 ms concat-free); sub-range-store packing and
    separate-plane-input DMA variants regressed 10-40x at one shape or
    the other (docs/KERNELS.md round 3). Stress grids therefore stay at
    cols=1024, where THIS form is the proven one."""
    d, rt, c = xv.shape
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch_and_pack():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()
        xs[...] = pack_byte_planes(xv[...])

    for r in range(rt):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (c, CHUNK), 0)
              == p_ref[r, :].reshape(1, CHUNK)).astype(jnp.int8)
        planes = jnp.dot(xs[:, r, :], oh, preferred_element_type=jnp.int32)
        o_ref[:, r, :] = recombine_byte_planes(planes, d, o_ref.dtype)


def int8_rlp_ok(d: int, r: int, c: int, dtype) -> bool:
    """Long-row regime where the byte-plane kernel is the measured win;
    short rows keep the hier/flat kernels (hier wins there, and the
    crossover is untested below ~2k lanes)."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n_planes = 2 if dtype == jnp.bfloat16 else 4
    tile = (1 + n_planes) * d * INT8_RT * c     # bf16/f32 tile + int8 planes
    return (r % INT8_RT == 0 and c % CHUNK == 0 and c > 2048
            and tile + (4 << 20) <= 80 << 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute_int8(x: jnp.ndarray, p: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C] bf16/f32; p: [R, C] int32 → out[:, r, c] =
    x[:, r, p[r, c]] — exact (pure byte transport through int8 one-hots)."""
    d, r, c = x.shape
    assert p.shape == (r, c), (p.shape, x.shape)
    assert int8_rlp_ok(d, r, c, x.dtype), (x.shape, x.dtype)
    n_planes = 2 if x.dtype == jnp.bfloat16 else 4
    return pl.pallas_call(
        _i8_kernel,
        grid=(r // INT8_RT, c // CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((INT8_RT, CHUNK), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, INT8_RT, CHUNK), lambda j, i: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, INT8_RT, c), x.dtype),
                        pltpu.VMEM((n_planes * d, INT8_RT, c), jnp.int8),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(x, p)


# ---------------------------------------------------------------------------
# int8 byte-plane HIER kernel: the hier kernel's two one-hot levels run on
# raw value BYTES (same exactness argument as row_local_permute_int8 — a
# permutation one-hot selects exactly one source per output, so int8 plane
# transport is bit-exact). Wins at short rows too: each [W, W] one-hot
# loads into the MXU at the 2x int8 rate and the M axis packs n_planes*d
# rows instead of d. Stage-A results fit int8 exactly ((byte-128) in
# [-128, 127]), so the cross-block exchange also runs on int8 planes —
# for bf16 that is the same byte traffic as the bf16 exchange (2d int8
# rows vs d bf16 rows); the win is purely the matmul levels.
# ---------------------------------------------------------------------------


def _hier_i8_kernel(x_ref, p_ref, o_ref, xs):
    """Block [d, rows, C] + packed hier tables [rows, C] → permuted block,
    byte planes end-to-end: pack once per block, stage A → exchange →
    stage B on int8, recombine bytes at the store."""
    d, rows, c = x_ref.shape
    w = HIER_W
    b = c // w
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)

    xs[...] = pack_byte_planes(x_ref[...])

    def onehot_dot_i8(vals, p_slice):
        oh = (iota == p_slice.reshape(1, w)).astype(jnp.int8)
        return jnp.dot(vals, oh, preferred_element_type=jnp.int32)

    for r in range(rows):
        x = xs[:, r, :]                                  # [Pd, C] int8
        word = p_ref[r, :]
        p0 = word & 1023
        s = (word >> 10) & 1023
        p2 = word >> 20
        # stage A: in-block source shuffle; results are exact plane bytes
        # ((byte - 128) in [-128, 127] — the int8 round-trip is lossless)
        a0 = [onehot_dot_i8(x[:, j * w:(j + 1) * w],
                            p0[j * w:(j + 1) * w]).astype(jnp.int8)
              for j in range(b)]
        for bb in range(b):
            sb = s[bb * w:(bb + 1) * w].reshape(1, w)
            acc = a0[0]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[j], acc)
            planes = onehot_dot_i8(acc, p2[bb * w:(bb + 1) * w])
            o_ref[:, r, bb * w:(bb + 1) * w] = recombine_byte_planes(
                planes, d, o_ref.dtype)


def hier_int8_ok(d: int, r: int, c: int, dtype) -> bool:
    """Shapes the int8 hier kernel handles (same tiling contract as the
    hier kernel, plus the int8 plane scratch within scoped VMEM)."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n_planes = 2 if dtype == jnp.bfloat16 else 4
    rows = _rlp_rows(d, r, c, dtype)
    isz = jnp.dtype(dtype).itemsize
    tile = d * rows * c * isz * 2 + n_planes * d * rows * c
    return (r % rows == 0 and c % HIER_W == 0 and c // HIER_W <= 16
            and tile + (4 << 20) <= 80 << 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute_hier_int8(x: jnp.ndarray, packed: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C] bf16/f32; packed hier tables [R, C] int32 →
    out[:, r, c] = x[:, r, full_perm[r, c]] — exact byte transport."""
    d, r, c = x.shape
    assert packed.shape == (r, c), (packed.shape, x.shape)
    assert hier_int8_ok(d, r, c, x.dtype), (x.shape, x.dtype)
    rows = _rlp_rows(d, r, c, x.dtype)
    n_planes = 2 if x.dtype == jnp.bfloat16 else 4
    return pl.pallas_call(
        _hier_i8_kernel,
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n_planes * d, rows, c), jnp.int8)],
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(x, packed)


# ---------------------------------------------------------------------------
# Dynamic-gather row-local permute (round 4 — the VERDICT r3 "measure the
# alternative primitive" item, measured in docs/DG2_PROBE.json /
# docs/STAGE_VARIANTS.json): tpu.dynamic_gather (jnp.take_along_axis in
# kernel) IS available on this stack, with hard constraints discovered by
# probe:
#   * 2D gathers only (vector<SxLxdtype>, gather along lanes);
#   * the gather dimension must fit ONE vreg → 128-lane blocks only
#     ("Multiple source vregs along gather dimension" at W=256);
#   * index bitwidth must equal data bitwidth, and 16-bit iota/indices
#     don't survive lowering → bf16 data gathers via an in-VMEM f32
#     upcast (still exact: pure data movement).
# Within those constraints it beats the one-hot MXU kernels at the bench
# stage shape [32, 2048, 1024]: f32 3.87 → 2.84 ms (exact — no bf16 hi/lo
# split), bf16 2.80 → 2.61, and the fused permute+transpose becomes
# profitable (3.39 vs 2.84 + 1.18 separate f32) because the body has no
# per-row MXU issues to serialize. Uses the SAME packed hier word format
# at W=128 (p0 | s<<10 | p2<<20), so routing and table bandwidth are
# unchanged. Long rows (C > 2048: B > 16) keep the int8 flat kernel — the
# unrolled exchange is O(B^2) selects.
# ---------------------------------------------------------------------------

DG_W = 128


def _dg_row_gather(vals2d, idx1d):
    """vals [d, w<=128]; idx [w] int32 → vals[:, idx[c]] via a single-vreg
    tpu.dynamic_gather (32-bit dtypes only)."""
    ib = jnp.broadcast_to(idx1d[None], vals2d.shape)
    return jnp.take_along_axis(vals2d, ib, axis=1)


def _dg_widen(x):
    """bf16 [d, C] → uint32 [d/2, C] via the sublane-packing bitcast.
    Lanes keep their column identity (the vreg is reinterpreted in
    place), so lane-wise gathers/selects on the u32 view move bf16 PAIRS
    exactly — bit-exact by construction and HALF the vreg work of the
    old f32-upcast path (which doubled the data instead of halving the
    row count)."""
    if x.dtype == jnp.bfloat16:
        return pltpu.bitcast(x, jnp.uint32)
    return x


def _dg_narrow(x, dtype):
    if dtype == jnp.bfloat16:
        return pltpu.bitcast(x, jnp.bfloat16)
    return x.astype(dtype)


def _dg_permute_row(x, word, w: int):
    """One row's full hier permute on dynamic gathers: stage A (in-block
    source shuffle), cross-block exchange (lane selects), stage B
    (in-block placement). x [d, C] f32."""
    b = x.shape[1] // w
    p0 = word & 1023
    s = (word >> 10) & 1023
    p2 = word >> 20
    a0 = [_dg_row_gather(x[:, j * w:(j + 1) * w], p0[j * w:(j + 1) * w])
          for j in range(b)]
    outs = []
    for bb in range(b):
        sb = s[bb * w:(bb + 1) * w].reshape(1, w)
        if b & (b - 1) == 0 and b > 1:
            # binary mux tree: log2(b) lane-mask computes + b-1 vselects
            # (the linear chain pays b-1 compares on top of the selects)
            cur = list(a0)
            k = 0
            while len(cur) > 1:
                m = ((sb >> k) & 1) == 1
                cur = [jnp.where(m, cur[j + 1], cur[j])
                       for j in range(0, len(cur), 2)]
                k += 1
            acc = cur[0]
        else:
            acc = a0[0]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[j], acc)
        outs.append(_dg_row_gather(acc, p2[bb * w:(bb + 1) * w]))
    return jnp.concatenate(outs, axis=1)


def _dgv_permute_block(xg, wordg, w: int):
    """FULL-BLOCK row-local permute (round 4, docs/DGV_PROBE.json): the
    per-row loop above costs ~1 us/row of fixed overhead ([d, 1, C] slab
    relayouts + per-row index prep) — the whole pass at the bench shape.
    tpu.dynamic_gather takes a full [S, L] index OPERAND, so indices may
    differ PER SUBLANE: merge [d, g, C] -> [d*g, C] (layout-preserving
    for g % 8 == 0 — C stays the lane dim, tiles are reindexed) and run
    b=C/w block gathers + ONE shared mux tree for all rows at once.
    bf16 upcasts to f32 in VMEM (exact — pure data movement; measured
    FASTER than the per-row u32 sublane-bitcast: 1.77 vs 2.38 ms/pass,
    and 16-bit indices don't survive lowering, docs/DG2_PROBE.json)."""
    d, g, c = xg.shape
    b = c // w
    odtype = xg.dtype
    x2 = xg.reshape(d * g, c)
    if x2.dtype != jnp.float32:
        x2 = x2.astype(jnp.float32)
    p0 = wordg & 1023
    s = (wordg >> 10) & 1023
    p2 = wordg >> 20

    def idx(v):
        return jnp.broadcast_to(v[None], (d,) + v.shape).reshape(
            d * g, v.shape[1])

    a0 = [jnp.take_along_axis(x2[:, j * w:(j + 1) * w],
                              idx(p0[:, j * w:(j + 1) * w]), axis=1)
          for j in range(b)]
    outs = []
    for bb in range(b):
        if b == 1:
            acc = a0[0]
        else:
            sb = idx(s[:, bb * w:(bb + 1) * w])
            if b & (b - 1) == 0:
                cur = list(a0)
                k = 0
                while len(cur) > 1:
                    m = ((sb >> k) & 1) == 1
                    cur = [jnp.where(m, cur[jj + 1], cur[jj])
                           for jj in range(0, len(cur), 2)]
                    k += 1
                acc = cur[0]
            else:
                acc = a0[0]
                for jj in range(1, b):
                    acc = jnp.where(sb == jj, a0[jj], acc)
        outs.append(jnp.take_along_axis(
            acc, idx(p2[:, bb * w:(bb + 1) * w]), axis=1))
    out = outs[0] if b == 1 else jnp.concatenate(outs, axis=1)
    return out.astype(odtype).reshape(d, g, c)


def _dg_kernel(x_ref, p_ref, o_ref, *, w: int):
    o_ref[...] = _dgv_permute_block(x_ref[...], p_ref[...], w)


def _dgv_rows(d: int, r: int, c: int, dtype) -> int:
    """Block rows for the full-block kernel: bigger than _rlp_rows (the
    merged [d*g, C] ops amortize grid overhead; probe: r32 ≥ r64 > r128)
    while the f32 work arrays (~3 copies) + double-buffered io stay in
    scoped VMEM."""
    isz = jnp.dtype(dtype).itemsize
    min_rows = 16 if dtype == jnp.bfloat16 else 8   # value-reshape tile
    for rows in (32, 16, 8):
        if rows < min_rows or r % rows:
            continue
        vmem = d * rows * c * (4 * isz + 3 * 4)
        if vmem + (4 << 20) <= 80 << 20:
            return rows
    return _rlp_rows(d, r, c, dtype)


def dg_ok(d: int, r: int, c: int, dtype) -> bool:
    """Shapes/dtypes the dynamic-gather kernel handles: 128-lane blocks,
    unrolled exchange bounded at B <= 16 (like the hier kernel), 32-bit
    gathers (bf16 rides the sublane-pair u32 bitcast: d must be even)."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if dtype == jnp.bfloat16 and d % 2:
        return False
    rows = _rlp_rows(d, r, c, dtype)
    isz = jnp.dtype(dtype).itemsize
    # io block + permute temporaries (u32 view is the same bytes as the
    # bf16 input; f32 temporaries are input-sized too)
    tile = d * rows * c * (isz + isz if dtype == jnp.bfloat16
                           else isz + 4)
    return (r % rows == 0 and c % DG_W == 0 and c // DG_W <= 16
            and tile + (4 << 20) <= 80 << 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute_dg(x: jnp.ndarray, packed: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed hier tables [R, C] int32 (route_rows_hier at
    W=128) → out[:, r, c] = x[:, r, full_perm[r, c]] — exact in all
    supported dtypes (pure data movement)."""
    d, r, c = x.shape
    assert packed.shape == (r, c), (packed.shape, x.shape)
    assert dg_ok(d, r, c, x.dtype), (x.shape, x.dtype)
    rows = _dgv_rows(d, r, c, x.dtype)
    return pl.pallas_call(
        functools.partial(_dg_kernel, w=DG_W),
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(x, packed)


def _dg2_kernel(xa_ref, xb_ref, pa_ref, pb_ref, oa_ref, ob_ref, *, w: int):
    oa_ref[...] = _dgv_permute_block(xa_ref[...], pa_ref[...], w)
    ob_ref[...] = _dgv_permute_block(xb_ref[...], pb_ref[...], w)


def _dgv_rows2(d: int, r: int, c: int, dtype) -> int:
    """Block rows for the dual kernel: same policy as _dgv_rows with the
    VMEM budget split across the two streams."""
    isz = jnp.dtype(dtype).itemsize
    min_rows = 16 if dtype == jnp.bfloat16 else 8
    for rows in (32, 16, 8):
        if rows < min_rows or r % rows:
            continue
        vmem = 2 * d * rows * c * (4 * isz + 3 * 4)
        if vmem + (4 << 20) <= 80 << 20:
            return rows
    return min_rows


def dg2_ok(d: int, r: int, c: int, dtype) -> bool:
    if not dg_ok(d, r, c, dtype):
        return False
    return r % _dgv_rows2(d, r, c, dtype) == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute_dg2(xa: jnp.ndarray, xb: jnp.ndarray,
                          pa: jnp.ndarray, pb: jnp.ndarray,
                          interpret: bool = False):
    """Dual-stream ``row_local_permute_dg``: two same-shape streams with
    independent tables in ONE kernel — the stage kernels are
    DMA/overhead-bound (docs/KERNELS.md round 4), so sharing the grid
    ramp and interleaving the two streams' io phases beats two launches.
    The q/i role pair always travels together in the hyperedge pipeline
    (hyperagg.py), which is what makes the pairing free."""
    d, r, c = xa.shape
    assert xb.shape == (d, r, c) and xa.dtype == xb.dtype
    assert pa.shape == (r, c) and pb.shape == (r, c)
    assert dg_ok(d, r, c, xa.dtype), (xa.shape, xa.dtype)
    rows = _dgv_rows2(d, r, c, xa.dtype)
    assert r % rows == 0, (r, rows)
    blk = pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((rows, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((d, r, c), xa.dtype)
    return pl.pallas_call(
        functools.partial(_dg2_kernel, w=DG_W),
        grid=(r // rows,),
        in_specs=[blk, blk, tab, tab],
        out_specs=[blk, blk],
        out_shape=[out_shape, out_shape],
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(xa, xb, pa, pb)


def _transpose2_kernel(xa_ref, xb_ref, oa_ref, ob_ref):
    oa_ref[...] = jnp.swapaxes(xa_ref[...], 1, 2)
    ob_ref[...] = jnp.swapaxes(xb_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def block_transpose2(xa: jnp.ndarray, xb: jnp.ndarray, tile: int = 128,
                     interpret: bool = False):
    """Dual-stream ``block_transpose`` (see row_local_permute_dg2)."""
    d, r, c = xa.shape
    assert xb.shape == (d, r, c) and xa.dtype == xb.dtype
    assert r % tile == 0 and c % tile == 0, (r, c, tile)
    in_blk = pl.BlockSpec((d, tile, tile), lambda i, j: (0, j, i),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((d, tile, tile), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((d, c, r), xa.dtype)
    return pl.pallas_call(
        _transpose2_kernel,
        grid=(c // tile, r // tile),
        in_specs=[in_blk, in_blk],
        out_specs=[out_blk, out_blk],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(xa, xb)


def _tlp_dg_kernel(x_hbm, p_ref, o_ref, xv, y_ref, sem, *, w: int):
    """Fused dg-permute + block transpose: at i == 0 DMA the [d, RT, C]
    row tile and permute it IN PLACE in scratch (16-row fori groups keep
    the Mosaic program small); each chunk stores one in-VMEM swapaxes."""
    d, rt, c = xv.shape
    i = pl.program_id(1)
    j = pl.program_id(0)
    grp = 16

    @pl.when(i == 0)
    def _fetch_and_permute():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()

        def body(g, _):
            rows_sl = pl.ds(g * grp, grp)
            xv[:, rows_sl, :] = _dgv_permute_block(
                xv[:, rows_sl, :], p_ref[rows_sl, :], w)
            return 0

        jax.lax.fori_loop(0, rt // grp, body, 0, unroll=False)

    off = pl.multiple_of(i * CHUNK, CHUNK)
    xs = xv[:, :, pl.ds(off, CHUNK)]
    if _mxu_swap_ok(xs):
        _mxu_swap_store(o_ref, xs)      # frees the VPU for the dg body
    else:
        y_ref[...] = xs
        o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


def tlp_dg_ok(d: int, r: int, c: int, dtype) -> bool:
    if not dg_ok(d, r, c, dtype) or r % TLP_RT:
        return False
    tile = d * TLP_RT * c * jnp.dtype(dtype).itemsize
    return 2 * tile + (8 << 20) <= _TLP_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def transposed_local_permute_dg(x: jnp.ndarray, packed: jnp.ndarray,
                                interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed W=128 hier tables [R, C] → out [d, C, R] with
    out[:, c, r] = x[:, r, full_perm[r, c]] (= bt(rlp_dg(x)), one HBM
    round-trip)."""
    d, r, c = x.shape
    assert packed.shape == (r, c), (packed.shape, x.shape)
    assert tlp_dg_ok(d, r, c, x.dtype), (x.shape, x.dtype)
    return pl.pallas_call(
        functools.partial(_tlp_dg_kernel, w=DG_W),
        grid=(r // TLP_RT, c // CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((TLP_RT, c), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, CHUNK, TLP_RT), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, TLP_RT, c), x.dtype),
                        pltpu.VMEM((d, TLP_RT, CHUNK), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TLP_BUDGET + (16 << 20)),
        interpret=interpret,
    )(x, packed)


def _tlp_dg_pre_kernel(x_hbm, p_ref, o_ref, xv, tbuf, y_ref, sems, *,
                       w: int):
    """Fused block-transpose + dg-permute + block-transpose: consumes the
    UNTRANSPOSED [d, R, C] array that _sig_inverse previously ran a
    standalone ``block_transpose`` HBM pass on. At i == 0 the j-th C-tile
    is assembled TRANSPOSED in scratch by a pipeline of [d, 128, RT]
    column-slab DMAs each followed by an in-VMEM swapaxes (double-buffered
    tbuf overlaps the next fetch with the current transpose), then
    dg-permuted in place exactly like _tlp_dg_kernel; chunk stores emit
    the second transpose. One HBM round trip replaces bt + tlp (two)."""
    d, rt, cp = xv.shape                    # cp = R, the permute row length
    i = pl.program_id(1)
    j = pl.program_id(0)
    grp = 16

    @pl.when(i == 0)
    def _fetch_transpose_permute():
        nk = cp // TLP_RT

        def dma(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(k * TLP_RT, TLP_RT),
                         pl.ds(pl.multiple_of(j * rt, rt), rt)],
                tbuf.at[slot], sems.at[slot])

        dma(0).start()

        def fetch_body(k, _):
            @pl.when(k + 1 < nk)
            def _():
                dma(k + 1).start()
            dma(k).wait()
            tb = tbuf[jax.lax.rem(k, 2)]
            off_k = k * TLP_RT
            if _mxu_swap_ok(tb):
                d_ = tb.shape[0]
                n_mxu = max(0, min(d_, int(round(d_ * _MXU_SWAP_FRAC))))
                eye = _eye128(tb.dtype)
                for dd in range(n_mxu):
                    xv[dd, :, pl.ds(off_k, TLP_RT)] = (
                        jax.lax.dot_general(
                            tb[dd], eye, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        .astype(tb.dtype))
                if n_mxu < d_:
                    xv[n_mxu:, :, pl.ds(off_k, TLP_RT)] = jnp.swapaxes(
                        tb[n_mxu:], 1, 2)
            else:
                xv[:, :, pl.ds(off_k, TLP_RT)] = jnp.swapaxes(tb, 1, 2)
            return 0

        jax.lax.fori_loop(0, nk, fetch_body, 0, unroll=False)

        def body(g, _):
            rows_sl = pl.ds(g * grp, grp)
            xv[:, rows_sl, :] = _dgv_permute_block(
                xv[:, rows_sl, :], p_ref[rows_sl, :], w)
            return 0

        jax.lax.fori_loop(0, rt // grp, body, 0, unroll=False)

    off = pl.multiple_of(i * CHUNK, CHUNK)
    xs = xv[:, :, pl.ds(off, CHUNK)]
    if _mxu_swap_ok(xs):
        _mxu_swap_store(o_ref, xs)      # frees the VPU for the dg body
    else:
        y_ref[...] = xs
        o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


def tlp_dg_pre_ok(d: int, r: int, c: int, dtype) -> bool:
    """x is [d, r, c]; the permute acts on the TRANSPOSED view's rows
    (length r), tiled by C-slabs of TLP_RT lanes."""
    if not dg_ok(d, c, r, dtype):           # row length r, c rows
        return False
    if r % TLP_RT or c % TLP_RT:
        return False
    isz = jnp.dtype(dtype).itemsize
    tile = d * TLP_RT * r * isz
    tmp = 2 * d * TLP_RT * TLP_RT * isz
    return tile + tmp + (8 << 20) <= _TLP_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def transposed_local_permute_dg_pre(x: jnp.ndarray, packed: jnp.ndarray,
                                    interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed W=128 hier tables [C, R] → out [d, R, C] with
    out[:, r, c] = x[:, full_perm[c, r], c]
    (= bt(rlp_dg(bt(x))) = tlp_dg(bt(x)) in ONE HBM round trip — the
    _sig_inverse composition without the standalone bt pass)."""
    d, r, c = x.shape
    assert packed.shape == (c, r), (packed.shape, x.shape)
    assert tlp_dg_pre_ok(d, r, c, x.dtype), (x.shape, x.dtype)
    return pl.pallas_call(
        functools.partial(_tlp_dg_pre_kernel, w=DG_W),
        grid=(c // TLP_RT, r // CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((TLP_RT, r), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, CHUNK, TLP_RT), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, TLP_RT, r), x.dtype),
                        pltpu.VMEM((2, d, TLP_RT, TLP_RT), x.dtype),
                        pltpu.VMEM((d, TLP_RT, CHUNK), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TLP_BUDGET + (16 << 20)),
        interpret=interpret,
    )(x, packed)


# ---------------------------------------------------------------------------
# Hierarchical row-local permute (second Clos level, ops/benes.py
# route_rows_hier): each length-C row is itself a routed [B, W=128] grid, so
# the per-output one-hot depth drops from C to 2·W (two in-block MXU
# matmuls) plus a B-way cross-block exchange done with in-VMEM lane selects
# — no HBM traffic, ~C/(2W)x less MXU work and ~C/W fewer mask elements
# than the flat kernel. Stage tables arrive bit-packed one int32 per
# element (p0 | s<<10 | p2<<20), so table bandwidth is unchanged.
# ---------------------------------------------------------------------------

HIER_W = 128


def _hier_kernel(x_ref, p_ref, o_ref, *, w: int):
    """Block [d, ROWS, C] + packed hier tables [ROWS, C] → permuted block.

    Per row: stage A applies the in-block source shuffle (one [*, W]·[W, W]
    one-hot matmul per block), the exchange moves values across blocks at
    fixed lane (chained selects, B-1 per output block), stage B places
    values at final lanes (one one-hot matmul per block). f32 inputs ride
    the bf16 hi/lo split through the matmuls (recombined before the
    exchange so selects run at d rows, re-split for stage B); bf16 needs no
    split — stage A's f32 accumulation is an exact selection of bf16
    values, so the bf16 round-trip between stages is lossless.

    ``w`` is the second-level block width (any power of two ≤ 1024 the
    10-bit packing allows). Wider blocks trade more MXU weight rows per
    output for fewer matmul issues, smaller mask builds per element, and a
    shorter exchange chain — W=256 measured faster than W=128 despite 2x
    the one-hot depth (the kernels are issue/VPU-bound, not
    weight-load-bound; docs/KERNELS.md round 3)."""
    d, rows, c = x_ref.shape
    b = c // w
    bf16_in = x_ref.dtype == jnp.bfloat16
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)

    def onehot_dot(vals, p_slice):
        oh = (iota == p_slice.reshape(1, w)).astype(jnp.bfloat16)
        both = jnp.dot(vals if bf16_in else split(vals), oh,
                       preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        return out.astype(x_ref.dtype)

    for r in range(rows):
        x = x_ref[:, r, :]
        word = p_ref[r, :]
        p0 = word & 1023
        s = (word >> 10) & 1023
        p2 = word >> 20
        a0 = [onehot_dot(x[:, j * w:(j + 1) * w], p0[j * w:(j + 1) * w])
              for j in range(b)]
        for bb in range(b):
            sb = s[bb * w:(bb + 1) * w].reshape(1, w)
            acc = a0[0]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[j], acc)
            o_ref[:, r, bb * w:(bb + 1) * w] = onehot_dot(
                acc, p2[bb * w:(bb + 1) * w])


def _hier_big_kernel(x_ref, p_ref, o_ref, a0, *, w: int = HIER_W):
    """Hier kernel for LONG rows (B = C/W > 16, up to 1024 via the 10-bit
    packing): the fully-unrolled exchange of ``_hier_kernel`` is O(B^2)
    statements per row — at stress scale (B = 77) that explodes Mosaic
    compile time (the flat kernel at this depth took 15 min to compile
    and 47 ms/pass). Here both phases run as ``fori_loop``s over blocks
    whose bodies trace ONCE:

      phase A: fori over source blocks — per block, a depth-W one-hot
               matmul per row into scratch a0 (dynamic 128-aligned lane
               stores);
      phase B: fori over output blocks — per row a chain of B-1 lane
               selects over a0 (static slices inside the body) and the
               stage-B one-hot, stored at the block's dynamic lane offset.

    Same packed stage words as ``_hier_kernel``."""
    d, rows, c = x_ref.shape
    b = c // w
    bf16_in = x_ref.dtype == jnp.bfloat16
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)

    def onehot_dot(vals, p_slice):
        oh = (iota == p_slice.reshape(1, w)).astype(jnp.bfloat16)
        both = jnp.dot(vals if bf16_in else split(vals), oh,
                       preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        return out.astype(x_ref.dtype)

    def phase_a(bb, _):
        off = pl.multiple_of(bb * w, w)
        xg = x_ref[:, :, pl.ds(off, w)]
        pg = p_ref[:, pl.ds(off, w)] & 1023
        a0[:, :, pl.ds(off, w)] = jnp.stack(
            [onehot_dot(xg[:, rr, :], pg[rr, :]) for rr in range(rows)],
            axis=1)
        return 0

    jax.lax.fori_loop(0, b, phase_a, 0, unroll=False)

    def phase_b(bb, _):
        off = pl.multiple_of(bb * w, w)
        word = p_ref[:, pl.ds(off, w)]
        sg = (word >> 10) & 1023
        p2g = word >> 20
        outs = []
        for rr in range(rows):
            sb = sg[rr, :].reshape(1, w)
            acc = a0[:, rr, 0:w]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[:, rr, j * w:(j + 1) * w], acc)
            outs.append(onehot_dot(acc, p2g[rr, :]))
        o_ref[:, :, pl.ds(off, w)] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, b, phase_b, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "w"))
def row_local_permute_hier(x: jnp.ndarray, packed: jnp.ndarray,
                           interpret: bool = False,
                           w: int = HIER_W) -> jnp.ndarray:
    """x: [d, R, C]; packed hier tables [R, C] int32 (route_rows_hier) →
    out[:, r, c] = x[:, r, full_perm[r, c]]."""
    d, r, c = x.shape
    assert packed.shape == (r, c), (packed.shape, x.shape)
    rows = _rlp_rows(d, r, c, x.dtype)
    assert r % rows == 0 and c % w == 0, (r, c, w)
    big = c // w > 16
    return pl.pallas_call(
        functools.partial(_hier_big_kernel if big else _hier_kernel, w=w),
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=([pltpu.VMEM((d, rows, c), x.dtype)] if big else []),
        compiler_params=_RLP_VMEM,
        interpret=interpret,
    )(x, packed)


# ---------------------------------------------------------------------------
# Fused hierarchical transposed-local-permute:
#   out = block_transpose(row_local_permute_hier(x, packed))
# in ONE kernel — the rlp+bt pair appears ~24 times per train step
# (hyperagg._rlp_bt), so saving the intermediate's HBM round-trip is the
# single largest stream reduction available after the hier decomposition.
#
# Grid (R//TLP_RT, C//HIER_W), chunk axis fastest. Per row-tile j:
#   i == 0: DMA the [d, RT, C] x tile into VMEM, run stage A (in-block
#           source shuffles) for the WHOLE tile into scratch a0 — the
#           exchange of any output chunk can pull from any block, so all of
#           stage A must exist before the first chunk is emitted.
#   each i: cross-block exchange (chained lane selects on a0) + stage B
#           placement into row-major scratch y, then one in-VMEM swapaxes
#           writes the transposed [d, CHUNK, RT] output block.
# MXU work is identical to row_local_permute_hier; only the HBM traffic
# halves (read x once, write out once). Row loops run as fori_loop over
# 16-row groups so the Mosaic program stays at the plain hier kernel's
# size instead of unrolling TLP_RT=128 rows.
# ---------------------------------------------------------------------------


def tlp_hier_ok(d: int, r: int, c: int, dtype) -> bool:
    """Whether the fused hier TLP kernel handles this shape: grid tiling
    constraints + two [d, TLP_RT, C] scratch buffers within scoped VMEM."""
    if r % TLP_RT or c % HIER_W:
        return False
    tile = d * TLP_RT * c * jnp.dtype(dtype).itemsize
    return 2 * tile + (4 << 20) <= _TLP_BUDGET


def _tlp_hier_kernel(x_hbm, p_ref, pc_ref, o_ref, xv, a0, y_ref, sem):
    d, rt, c = xv.shape
    w = HIER_W
    b = c // w
    bf16_in = xv.dtype == jnp.bfloat16
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    grp = 16                                   # rows per fori body
    i = pl.program_id(1)                       # chunk (output block) axis
    j = pl.program_id(0)                       # row-tile axis

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)

    def onehot_dot(vals, p_slice):
        oh = (iota == p_slice.reshape(1, w)).astype(jnp.bfloat16)
        both = jnp.dot(vals if bf16_in else split(vals), oh,
                       preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        return out.astype(xv.dtype)

    @pl.when(i == 0)
    def _fetch_and_stage_a():
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * rt, rt), :], xv, sem)
        dma.start()
        dma.wait()

        # fully static loops: Mosaic optimizes static slices/stores far
        # better than dynamic-index fori bodies (measured 5.3 vs 3.3 ms
        # for the dynamic version at f32 bench shape)
        for g in range(rt // grp):
            pg = p_ref[g * grp:(g + 1) * grp, :] & 1023
            for rr in range(grp):
                r_abs = g * grp + rr
                x_row = xv[:, r_abs, :]
                for bb in range(b):
                    a0[:, r_abs, bb * w:(bb + 1) * w] = onehot_dot(
                        x_row[:, bb * w:(bb + 1) * w],
                        pg[rr, bb * w:(bb + 1) * w])

    word = pc_ref[...]                          # [rt, w] chunk-i words
    sg = (word >> 10) & 1023
    p2g = word >> 20
    for r_abs in range(rt):
        sb = sg[r_abs, :].reshape(1, w)
        acc = a0[:, r_abs, 0:w]
        for blk in range(1, b):
            acc = jnp.where(sb == blk, a0[:, r_abs, blk * w:(blk + 1) * w],
                            acc)
        y_ref[:, r_abs, :] = onehot_dot(acc, p2g[r_abs, :])
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def transposed_local_permute_hier(x: jnp.ndarray, packed: jnp.ndarray,
                                  interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed hier tables [R, C] int32 (route_rows_hier) →
    out [d, C, R] with out[:, c, r] = x[:, r, full_perm[r, c]]."""
    d, r, c = x.shape
    assert packed.shape == (r, c), (packed.shape, x.shape)
    assert r % TLP_RT == 0 and c % HIER_W == 0, (r, c)
    isz = jnp.dtype(x.dtype).itemsize
    tile = d * TLP_RT * c * isz
    assert 2 * tile + (4 << 20) <= _TLP_BUDGET, (d, c, x.dtype)
    return pl.pallas_call(
        _tlp_hier_kernel,
        grid=(r // TLP_RT, c // HIER_W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((TLP_RT, c), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TLP_RT, HIER_W), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, HIER_W, TLP_RT), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, TLP_RT, c), x.dtype),
                        pltpu.VMEM((d, TLP_RT, c), x.dtype),
                        pltpu.VMEM((d, TLP_RT, HIER_W), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TLP_BUDGET + (16 << 20)),
        interpret=interpret,
    )(x, packed, packed)


def _tlp_bfly_kernel(x_hbm, p_ref, o_ref, av, y_ref, sem):
    """Fused butterfly permute + block transpose: at i == 0 DMA the
    [d, RT, C] row tile and butterfly-permute the WHOLE tile (full-block
    vector ops — no row loops) into scratch; each chunk then stores one
    in-VMEM swapaxes of a [d, RT, CHUNK] slice. One HBM round-trip for
    the rlp+bt pair."""
    rt = av.shape[1]
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch_and_permute():
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * rt, rt), :], av, sem)
        dma.start()
        dma.wait()
        av[...] = _bfly_permute_block(av[...], p_ref[...])

    off = pl.multiple_of(i * CHUNK, CHUNK)
    y_ref[...] = av[:, :, pl.ds(off, CHUNK)]
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def transposed_local_permute_bfly(x: jnp.ndarray, words: jnp.ndarray,
                                  interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed butterfly words [R, C] (ops/bfly.py) →
    out [d, C, R] with out[:, c, r] = x[:, r, full_perm[r, c]]."""
    d, r, c = x.shape
    assert words.shape == (r, c), (words.shape, x.shape)
    assert r % TLP_RT == 0 and c % HIER_W == 0, (r, c)
    return pl.pallas_call(
        _tlp_bfly_kernel,
        grid=(r // TLP_RT, c // CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((TLP_RT, c), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, CHUNK, TLP_RT), lambda j, i: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, TLP_RT, c), x.dtype),
                        pltpu.VMEM((d, TLP_RT, CHUNK), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TLP_BUDGET + (16 << 20)),
        interpret=interpret,
    )(x, words)


# ---------------------------------------------------------------------------
# Butterfly (Beneš) row-local permute: replaces the in-block one-hot MXU
# matmuls of the hier kernel with 13 VPU stages of roll+select per level.
# At d=32 the one-hots are weight-load-bound (~160 MXU cycles per 128
# entries); the butterfly runs ~0.5 cycles/entry on the VPU and is exact
# in every dtype (pure data movement — no bf16 hi/lo split needed).
# Switch words are host-routed (ops/bfly.py / csrc/routing.cc) and packed
# one int32 per element: stageA[0:13) | exchange-delta[13:17) | stageB[17:30).
#
# The whole [d, rows, C] block is processed with full-block vector ops:
# XOR-pairing shifts are < 128, so lane rolls never cross the 128-lane
# blocks they permute; the cross-block exchange rides (B-1) circular rolls
# by multiples of 128 selected per-lane by the packed delta.
# ---------------------------------------------------------------------------

BFLY_STAGES = 13
BFLY_SHIFTS = (64, 32, 16, 8, 4, 2, 1, 2, 4, 8, 16, 32, 64)


def _bfly_apply(x, bits):
    """Apply 13 butterfly stages along the lane axis of x [d, rows, c];
    bits [rows, c] int32 carry one switch bit per stage in bits [0, 13)."""
    c = x.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    for t, m in enumerate(BFLY_SHIFTS):
        hi = (lane & m) != 0                          # static direction
        sw = ((bits >> t) & 1)[None] != 0             # [1, rows, c]
        partner = jnp.where(hi, pltpu.roll(x, m, 2),
                            pltpu.roll(x, c - m, 2))   # -m mod c
        x = jnp.where(sw, partner, x)
    return x


def _bfly_permute_block(x, word, w: int = HIER_W):
    """Full hierarchical in-row permute of one [d, rows, c] block given
    packed butterfly words [rows, c]."""
    c = x.shape[2]
    b = c // w
    a = _bfly_apply(x, word & 0x1FFF)
    if b > 1:
        delta = ((word >> BFLY_STAGES) & 15)[None]    # [1, rows, c]
        acc = a
        for dd in range(1, b):
            acc = jnp.where(delta == dd, pltpu.roll(a, c - dd * w, 2), acc)
    else:
        acc = a
    return _bfly_apply(acc, word >> (BFLY_STAGES + 4))


def _bfly_kernel(x_ref, p_ref, o_ref):
    o_ref[...] = _bfly_permute_block(x_ref[...], p_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute_bfly(x: jnp.ndarray, words: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """x: [d, R, C]; packed butterfly words [R, C] int32 (ops/bfly.py) →
    out[:, r, c] = x[:, r, full_perm[r, c]]."""
    d, r, c = x.shape
    assert words.shape == (r, c), (words.shape, x.shape)
    rows = min(16 if x.dtype == jnp.bfloat16 else ROWS, r)
    assert r % rows == 0 and c % HIER_W == 0, (r, c)
    return pl.pallas_call(
        _bfly_kernel,
        grid=(r // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        interpret=interpret,
    )(x, words)


def unpack_hier_perm(packed: jnp.ndarray, w: int = HIER_W) -> jnp.ndarray:
    """Recover the full per-row permutation [R, C] from packed hier stage
    words (trace-safe jnp; used by the XLA twin paths)."""
    length = packed.shape[-1]
    p0 = packed & 1023
    s = (packed >> 10) & 1023
    p2 = packed >> 20
    base = (jnp.arange(length, dtype=packed.dtype) // w) * w
    j = jnp.take_along_axis(s, base[None, :] + p2, axis=1)
    return j * w + jnp.take_along_axis(p0, j * w + p2, axis=1)


def unpack_bfly_perm(words: jnp.ndarray, w: int = HIER_W) -> jnp.ndarray:
    """Recover the full per-row permutation [R, C] from packed butterfly
    words (trace-safe jnp): feed lane indices through the network —
    out[j] = in[perm[j]], so routing the identity yields perm itself."""
    r, c = words.shape
    lane = jnp.arange(c, dtype=jnp.int32)
    x = jnp.broadcast_to(lane[None, :], (r, c))

    def apply(x, bits):
        for t, m in enumerate(BFLY_SHIFTS):
            hi = (lane & m) != 0
            sw = ((bits >> t) & 1) != 0
            partner = jnp.where(hi[None, :], jnp.roll(x, m, 1),
                                jnp.roll(x, -m, 1))
            x = jnp.where(sw, partner, x)
        return x

    a = apply(x, words & 0x1FFF)
    b = c // w
    if b > 1:
        delta = (words >> BFLY_STAGES) & 15
        acc = a
        for dd in range(1, b):
            acc = jnp.where(delta == dd, jnp.roll(a, -dd * w, 1), acc)
    else:
        acc = a
    return apply(acc, words >> (BFLY_STAGES + 4))


def unpack_stage_perm(st: "StageTable") -> jnp.ndarray:
    """Full per-row permutation of any StageTable packing (XLA twins)."""
    if st.kind in ("hier", "dg"):      # dg = hier word format at W=128
        return unpack_hier_perm(st.tab, st.w)
    if st.kind == "bfly":
        return unpack_bfly_perm(st.tab)
    return st.tab


@struct.dataclass
class StageTable:
    """One row-local stage table, in one of three packings:

    * kind="flat" — raw per-row permutation, one-hot MXU kernel
    * kind="hier" — packed hierarchical Clos word (p0|s|p2), two
      ``w``-deep one-hot MXU levels + a C/w-way exchange
    * kind="dg"   — same packed word format at W=128, executed with
      tpu.dynamic_gather in-block levels (round 4 default: beats the
      one-hots at every measured short-row shape and is exact in all
      dtypes — docs/DG2_PROBE.json)
    * kind="bfly" — packed butterfly word (ops/bfly.py), pure-VPU
      roll+select kernel (measured dead end, kept for experiments)

    ``kind`` and ``w`` are trace-static (not pytree leaves) so kernel
    dispatch stays a Python branch under jit."""
    tab: Any                                   # [R, C] int32
    kind: str = struct.field(pytree_node=False, default="flat")
    w: int = struct.field(pytree_node=False, default=HIER_W)

    @property
    def hier(self) -> bool:
        return self.kind == "hier"


class PermutePlan(NamedTuple):
    """Host-routed stage tables for one static permutation (int32 device
    arrays once packed; see graph.py). ``rows``/``cols`` define the grid;
    the permuted length E may be shorter (the tail is padding)."""
    p0: jnp.ndarray   # [R, C]
    p1: jnp.ndarray   # [C, R]
    p2: jnp.ndarray   # [R, C]

    @property
    def rows(self) -> int:
        return self.p0.shape[0]

    @property
    def cols(self) -> int:
        return self.p0.shape[1]


def make_plan(perm: np.ndarray, c: int = 1024) -> PermutePlan:
    """Route ``out[j] = in[perm[j]]`` (arbitrary [E] permutation) into a
    PermutePlan. Pads E to R*C with identity tail (padding positions map to
    themselves, so padded input columns pass through)."""
    perm = np.asarray(perm, np.int64)
    e = perm.shape[0]
    r, c = pick_grid(e, c)
    full = np.concatenate([perm, np.arange(e, r * c, dtype=np.int64)])

    from ihgnn_tpu.ops import native
    routed = native.benes_route(full, r, c)
    if routed is None:                      # no toolchain: NumPy fallback
        from ihgnn_tpu.ops.benes import benes_route_rect
        routed = benes_route_rect(full, r, c)
    p0, p1, p2 = (np.asarray(p, np.int32) for p in routed)
    return PermutePlan(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                       p2=jnp.asarray(p2))


def benes_permute(x: jnp.ndarray, plan: PermutePlan,
                  interpret: bool = False) -> jnp.ndarray:
    """Apply a routed permutation to feature-major x [d, E_pad] where
    E_pad = plan.rows * plan.cols. Returns x[:, perm_padded]."""
    d, e_pad = x.shape
    r, c = plan.rows, plan.cols
    assert e_pad == r * c, (e_pad, r, c)
    g = x.reshape(d, r, c)
    a0 = row_local_permute(g, plan.p0, interpret=interpret)
    t0 = block_transpose(a0, interpret=interpret)          # [d, c, r]
    a1 = row_local_permute(t0, plan.p1, interpret=interpret)
    t1 = block_transpose(a1, interpret=interpret)          # [d, r, c]
    out = row_local_permute(t1, plan.p2, interpret=interpret)
    return out.reshape(d, e_pad)
