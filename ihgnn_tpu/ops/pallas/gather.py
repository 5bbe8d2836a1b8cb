"""Pallas TPU kernel: windowed one-hot gather (the banded expand).

Computes ``out[:, r*C + c] = x[:, idx[r, c]]`` for a feature-major source
[d, n_pad] and a host-packed index table whose rows are *banded*: every
row's indices fall inside a window ``[win[r], win[r] + w)`` of the source.
Per (row, 128-column chunk) the gather is a one-hot MXU matmul against the
row's DMA'd window — no data-dependent addressing, no serial XLA gather.

Bandedness holds by construction for every expansion in the hypergraph
pipeline: role ids sorted ascending give rows spanning ~C/avg_degree
source columns, and composing a Beneš stage-0 shuffle (ops/benes.py) with
the expansion keeps rows inside the same window. The packer measures the
true max span; callers fall back to XLA when it exceeds ``w_cap``
(pathologically sparse rows).

Replaces the reference's CUDA gather surface (torch_sparse /
Models/CommonLayers.py:70-72 endpoint gathers), which XLA lowers to a
serial gather (~60 ms per 2M-column gather on v5e at d=32).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class WindowedGatherPack(NamedTuple):
    """Host-packed operands (device arrays once shipped; see graph.py)."""
    idx_rel: jnp.ndarray   # [R, C/128, 128] int32 — idx - win[row]
    win: jnp.ndarray       # [R] int32 — 128-aligned window starts
    w: int                 # static window width (multiple of 128)
    src_pad: int           # required source column count (>= max win + w)

    @property
    def rows(self) -> int:
        return self.idx_rel.shape[0]

    @property
    def cols(self) -> int:
        return self.idx_rel.shape[1] * CHUNK


def pack_windows(idx: np.ndarray, w_cap: int = 16384) -> WindowedGatherPack:
    """Pack an absolute [R, C] index table into windowed-relative form.

    Raises ValueError when any row spans more than ``w_cap`` source
    columns — caller should use the XLA fallback then.
    """
    idx = np.asarray(idx, np.int64)
    r, c = idx.shape
    assert c % CHUNK == 0, c
    lo = idx.min(axis=1)
    hi = idx.max(axis=1)
    win = (lo // CHUNK) * CHUNK
    w = int(_round_up(int((hi - win).max()) + 1, CHUNK))
    if w > w_cap:
        raise ValueError(f"row span {w} exceeds cap {w_cap}")
    rel = (idx - win[:, None]).astype(np.int32)
    return WindowedGatherPack(
        idx_rel=jnp.asarray(rel.reshape(r, c // CHUNK, CHUNK)),
        win=jnp.asarray(win.astype(np.int32)),
        w=w,
        src_pad=int(_round_up(int(win.max()) + w, CHUNK)),
    )


NBUF = 4    # max window-DMA pipeline depth (rows in flight)


def _gather_kernel_i8(win_ref, idx_ref, x_hbm, o_ref, xwin, sems, ctr,
                      *, w: int, nbuf: int):
    """int8 byte-plane variant: a gather one-hot selects exactly one source
    per output (same exactness argument as the permutation kernels,
    permute.py), so the depth-w matmul runs on raw value bytes at the MXU's
    2x int8 rate with the one-hot mask built at 1 byte/element."""
    from ihgnn_tpu.ops.pallas.permute import (pack_byte_planes,
                                              recombine_byte_planes)
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)

    def dma(row):
        off = pl.multiple_of(win_ref[row], CHUNK)
        slot = jax.lax.rem(row, nbuf)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(off, w)], xwin.at[slot], sems.at[slot])

    @pl.when(r == 0)
    def _():
        ctr[0] = 0

    tgt = jnp.minimum(r + nbuf - 1, n_rows - 1)

    def fetch(rr, _):
        dma(rr).start()
        return 0

    fetched = ctr[0]
    jax.lax.fori_loop(jnp.maximum(fetched, r), tgt + 1, fetch, 0)
    ctr[0] = jnp.maximum(fetched, tgt + 1)

    slot = jax.lax.rem(r, nbuf)
    dma(r).wait()

    d = xwin.shape[1]
    xs = pack_byte_planes(xwin[slot])              # [Pd, w] int8
    n_chunks = idx_ref.shape[1]
    for j in range(n_chunks):
        rel = idx_ref[0, j, :].reshape(1, CHUNK)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0)
                  == rel).astype(jnp.int8)
        planes = jnp.dot(xs, onehot, preferred_element_type=jnp.int32)
        o_ref[:, j * CHUNK:(j + 1) * CHUNK] = recombine_byte_planes(
            planes, d, o_ref.dtype)


def _gather_kernel(win_ref, idx_ref, x_hbm, o_ref, xwin, sems, ctr,
                   *, w: int, nbuf: int):
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)

    def dma(row):
        # window starts are 128-aligned by pack_windows; the hint lets
        # Mosaic prove the HBM slice respects the (8, 128) tiling
        off = pl.multiple_of(win_ref[row], CHUNK)
        slot = jax.lax.rem(row, nbuf)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(off, w)], xwin.at[slot], sems.at[slot])

    @pl.when(r == 0)
    def _():
        ctr[0] = 0

    # keep NBUF-1 row windows in flight past the current row (each row is
    # consumed exactly once, so slot row%NBUF is free by the time the
    # prefetch reaches it)
    tgt = jnp.minimum(r + nbuf - 1, n_rows - 1)

    def fetch(rr, _):
        dma(rr).start()
        return 0

    fetched = ctr[0]
    jax.lax.fori_loop(jnp.maximum(fetched, r), tgt + 1, fetch, 0)
    ctr[0] = jnp.maximum(fetched, tgt + 1)

    slot = jax.lax.rem(r, nbuf)
    dma(r).wait()

    x = xwin[slot]                                 # [d, w]
    bf16_in = x.dtype == jnp.bfloat16
    if bf16_in:
        # permutation one-hot selects single bf16 values — exact, no split
        xs = x
    else:
        xhi = x.astype(jnp.bfloat16)
        xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        # M-packed hi/lo split: one MXU pass computes both halves (see
        # permute.py — M = 2d ≤ 128 rides the array's unused M capacity)
        xs = jnp.concatenate([xhi, xlo], axis=0)   # [2d, w]
    d = x.shape[0]
    n_chunks = idx_ref.shape[1]
    for j in range(n_chunks):
        rel = idx_ref[0, j, :].reshape(1, CHUNK)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0)
                  == rel).astype(jnp.bfloat16)
        both = jnp.dot(xs, onehot, preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        o_ref[:, j * CHUNK:(j + 1) * CHUNK] = out.astype(o_ref.dtype)


def gather_int8_ok(dtype) -> bool:
    return dtype in (jnp.bfloat16, jnp.float32)


@functools.partial(jax.jit, static_argnames=("w", "interpret", "int8"))
def windowed_gather(x_t: jnp.ndarray, idx_rel: jnp.ndarray, win: jnp.ndarray,
                    w: int, interpret: bool = False,
                    int8: bool = False) -> jnp.ndarray:
    """x_t: [d, n_pad]; idx_rel/win from ``pack_windows`` → [d, R*C] with
    out[:, r*C + c] = x_t[:, win[r] + idx[r, c]]. n_pad must be >=
    pack.src_pad (pad the source with zero columns). ``int8`` runs the
    byte-plane kernel (exact; 2x MXU rate)."""
    d, n_pad = x_t.shape
    r, n_chunks, _ = idx_rel.shape
    c = n_chunks * CHUNK
    assert w % CHUNK == 0 and n_pad % CHUNK == 0, (w, n_pad)
    assert not int8 or gather_int8_ok(x_t.dtype), x_t.dtype

    # clamp the pipeline depth so window buffers stay within ~6MB VMEM
    itemsize = jnp.dtype(x_t.dtype).itemsize
    nbuf = max(2, min(NBUF, (6 << 20) // max(d * w * itemsize, 1)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, CHUNK), lambda i, win: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((d, c), lambda i, win: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, d, w), x_t.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = _gather_kernel_i8 if int8 else _gather_kernel
    return pl.pallas_call(
        functools.partial(kernel, w=w, nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct((d, r * c), x_t.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(win, idx_rel, x_t)


# ---------------------------------------------------------------------------
# Fused transposed windowed gather: block_transpose(windowed_gather(...))
# in ONE kernel — every q/i role-forward starts with expand-then-transpose
# (hyperagg._role_forward), so emitting the [d, C, R] layout directly saves
# the intermediate's HBM round-trip.
#
# Grid (R//EXP_RT, C//CHUNK), chunk axis fastest. At i == 0 the program
# DMAs all EXP_RT row windows of the tile into a [RT, d, w] scratch (the
# windows of consecutive rows overlap, but fetching per-row keeps the
# buffer at RT*d*w instead of a data-dependent span). Each chunk then runs
# the same per-row depth-w one-hot matmuls as the row-major kernel into
# row-major scratch y, and one in-VMEM swapaxes writes the transposed
# [d, CHUNK, RT] output block.
# ---------------------------------------------------------------------------

EXP_RT = 128
_EXP_T_VMEM = 96 << 20


def exp_t_vmem_ok(d: int, w: int, dtype) -> bool:
    """Whether the fused transposed expand's [EXP_RT, d, w] window scratch
    (all 128 row windows live at once) fits scoped VMEM — wide windows on
    sparse graphs can blow it (w_cap is 16384 → 128 MB at bf16 d=32)."""
    isz = jnp.dtype(dtype).itemsize
    return EXP_RT * d * w * isz + (8 << 20) <= _EXP_T_VMEM


def _gather_t_kernel(win_ref, idx_ref, x_hbm, o_ref, xwin, y_ref, sems,
                     *, w: int):
    rt = xwin.shape[0]
    d = xwin.shape[1]
    i = pl.program_id(1)
    j = pl.program_id(0)
    grp = 16
    bf16_in = xwin.dtype == jnp.bfloat16

    @pl.when(i == 0)
    def _fetch_windows():
        def start(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[rr], sems.at[rr]).start()
            return 0

        jax.lax.fori_loop(0, rt, start, 0, unroll=False)

        def wait(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[rr], sems.at[rr]).wait()
            return 0

        jax.lax.fori_loop(0, rt, wait, 0, unroll=False)

    def body(g, _):
        rows = pl.ds(g * grp, grp)
        xg = xwin[rows]                          # [grp, d, w]
        rel = idx_ref[rows, :]                   # [grp, CHUNK]
        outs = []
        for rr in range(grp):
            x = xg[rr]
            if bf16_in:
                xs = x
            else:
                xhi = x.astype(jnp.bfloat16)
                xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
                xs = jnp.concatenate([xhi, xlo], axis=0)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0)
                      == rel[rr].reshape(1, CHUNK)).astype(jnp.bfloat16)
            both = jnp.dot(xs, onehot, preferred_element_type=jnp.float32)
            outs.append((both if bf16_in else both[:d] + both[d:])
                        .astype(y_ref.dtype))
        y_ref[:, rows, :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, rt // grp, body, 0, unroll=False)
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


def _gather_t_kernel_i8(win_ref, idx_ref, x_hbm, o_ref, xwin, xs, y_ref,
                        sems, *, w: int):
    """int8 byte-plane variant of the fused transposed expand: at i == 0
    the fetched row windows are packed ONCE into an int8 plane scratch
    [RT, Pd, w]; each chunk then runs depth-w int8 one-hot matmuls."""
    from ihgnn_tpu.ops.pallas.permute import recombine_byte_planes
    rt = xwin.shape[0]
    d = xwin.shape[1]
    n_planes = xs.shape[1] // d
    i = pl.program_id(1)
    j = pl.program_id(0)
    grp = 16

    @pl.when(i == 0)
    def _fetch_windows():
        def start(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[rr], sems.at[rr]).start()
            return 0

        jax.lax.fori_loop(0, rt, start, 0, unroll=False)

        def wait_and_pack(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[rr], sems.at[rr]).wait()
            return 0

        jax.lax.fori_loop(0, rt, wait_and_pack, 0, unroll=False)

        def pack(g, _):
            rows = pl.ds(g * grp, grp)
            v = xwin[rows]                       # [grp, d, w]
            if n_planes == 2:
                u = jax.lax.bitcast_convert_type(v, jnp.uint16).astype(
                    jnp.int32)
            else:
                u = jax.lax.bitcast_convert_type(v, jnp.uint32).astype(
                    jnp.int32)
            planes = [((u >> (8 * (n_planes - 1 - pi))) & 255) - 128
                      for pi in range(n_planes)]
            xs[rows] = jnp.concatenate(planes, axis=1).astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, rt // grp, pack, 0, unroll=False)

    def body(g, _):
        rows = pl.ds(g * grp, grp)
        xg = xs[rows]                            # [grp, Pd, w] int8
        rel = idx_ref[rows, :]                   # [grp, CHUNK]
        outs = []
        for rr in range(grp):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0)
                      == rel[rr].reshape(1, CHUNK)).astype(jnp.int8)
            planes = jnp.dot(xg[rr], onehot,
                             preferred_element_type=jnp.int32)
            outs.append(recombine_byte_planes(planes, d, y_ref.dtype))
        y_ref[:, rows, :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, rt // grp, body, 0, unroll=False)
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("w", "interpret", "int8"))
def windowed_gather_t(x_t: jnp.ndarray, idx_rel: jnp.ndarray,
                      win: jnp.ndarray, w: int, interpret: bool = False,
                      int8: bool = False) -> jnp.ndarray:
    """Fused transpose(windowed_gather): → [d, C, R] with
    out[:, c, r] = x_t[:, win[r] + idx[r, c]]."""
    d, n_pad = x_t.shape
    r, n_chunks, _ = idx_rel.shape
    c = n_chunks * CHUNK
    assert w % CHUNK == 0 and n_pad % CHUNK == 0, (w, n_pad)
    assert r % EXP_RT == 0, r
    assert not int8 or gather_int8_ok(x_t.dtype), x_t.dtype
    n_planes = 2 if x_t.dtype == jnp.bfloat16 else 4
    scratch = [
        pltpu.VMEM((EXP_RT, d, w), x_t.dtype),
        pltpu.VMEM((d, EXP_RT, CHUNK), x_t.dtype),
        pltpu.SemaphoreType.DMA((EXP_RT,)),
    ]
    if int8:
        scratch.insert(1, pltpu.VMEM((EXP_RT, n_planes * d, w), jnp.int8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // EXP_RT, n_chunks),
        in_specs=[
            # flat [R, C] view: per program the chunk's [EXP_RT, CHUNK]
            # relative indices (a (*, 1, 128) 3D block violates Mosaic's
            # tiling constraint)
            pl.BlockSpec((EXP_RT, CHUNK), lambda j, i, win: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((d, CHUNK, EXP_RT), lambda j, i, win: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    assert exp_t_vmem_ok(d, w, x_t.dtype), (d, w, x_t.dtype)
    kernel = _gather_t_kernel_i8 if int8 else _gather_t_kernel
    return pl.pallas_call(
        functools.partial(kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((d, c, r), x_t.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_EXP_T_VMEM + (16 << 20)),
        interpret=interpret,
    )(win, idx_rel.reshape(r, c), x_t)


def expand_pack(sorted_ids: np.ndarray, c: int = 1024,
                w_cap: int = 16384) -> Tuple[WindowedGatherPack, int]:
    """Pack a sorted duplicate-bearing id array [K] (an expansion) into the
    windowed form: rows of C consecutive entries. K pads to a multiple of
    C by repeating the last id. Returns (pack, padded K)."""
    ids = np.asarray(sorted_ids, np.int64)
    k = ids.shape[0]
    k_pad = _round_up(max(k, 1), c)
    if k_pad != k:
        ids = np.concatenate([ids, np.full(k_pad - k, ids[-1] if k else 0)])
    return pack_windows(ids.reshape(-1, c), w_cap=w_cap), k_pad
