"""Probe: long-row (stress-scale) row-local permute kernel variants.

At the 10M-edge stress config the Clos middle stage runs on rows of
length ~9856 (B = 77 blocks of 128): the production flat one-hot kernel
measures 47.2 ms/pass bf16 there and takes ~15 min to Mosaic-compile
(rows x chunks unroll); the fori big-B hier kernel measures 83 ms
(O(B^2) select-chain traffic).  This probe measures alternatives at the
real shape before anything is integrated (CLAUDE.md: estimates for
exotic kernels were off 2-40x; measure standalone first).

Variants
  v1_dma   flat one-hot, grid over (row-tile, out-chunk), x row-tile
           manually DMA'd once per row tile (single-buffered scratch) —
           one dot per (row, chunk); body traced once -> fast compile.
  v2_fori  like v1 but the K axis also runs as fori over 128-wide source
           chunks with an f32 accumulator -> smallest program.
  v3_int8  v1 with int8 byte planes: bf16 values split into two
           (value-128) int8 planes stacked on M; the one-hot is int8 so
           the MXU runs at its 2x int8 rate.  A permutation one-hot
           selects exactly one source per output, so plane recombination
           is exact (no arithmetic mixes planes).

Run on the real TPU, single process, natural completion.
Usage: python tools/probe_longrow.py [rows] [c]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

W = 128
RT = 16          # rows per tile (bf16 sublane tile)
_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


def _iota_eq(p, k):
    return (jax.lax.broadcasted_iota(jnp.int32, (k, W), 0)
            == p.reshape(1, W))


# --------------------------------------------------------------------------
# v1: flat one-hot, manual row-tile DMA, grid over chunks
# --------------------------------------------------------------------------


def _v1_kernel(x_hbm, p_ref, o_ref, xv, sem):
    d, rt, c = xv.shape
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()

    for r in range(rt):
        oh = _iota_eq(p_ref[r, :], c).astype(jnp.bfloat16)
        o_ref[:, r, :] = jnp.dot(
            xv[:, r, :], oh,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def v1_dma(x, p):
    d, r, c = x.shape
    return pl.pallas_call(
        _v1_kernel,
        grid=(r // RT, c // W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((RT, W), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, RT, W), lambda j, i: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, RT, c), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(x, p)


# --------------------------------------------------------------------------
# v2: fori over source chunks with accumulator
# --------------------------------------------------------------------------


def _v2_kernel(x_hbm, p_ref, o_ref, xv, sem):
    d, rt, c = xv.shape
    b = c // W
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()

    for r in range(rt):
        p = p_ref[r, :].reshape(1, W)

        def body(k, acc):
            off = pl.multiple_of(k * W, W)
            oh = ((jax.lax.broadcasted_iota(jnp.int32, (W, W), 0) + off)
                  == p).astype(jnp.bfloat16)
            return acc + jnp.dot(xv[:, r, pl.ds(off, W)], oh,
                                 preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, b, body, jnp.zeros((d, W), jnp.float32),
                                unroll=False)
        o_ref[:, r, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def v2_fori(x, p):
    d, r, c = x.shape
    return pl.pallas_call(
        _v2_kernel,
        grid=(r // RT, c // W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((RT, W), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, RT, W), lambda j, i: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((d, RT, c), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(x, p)


# --------------------------------------------------------------------------
# v3: int8 byte planes (2x MXU rate), one dot per (row, chunk)
# --------------------------------------------------------------------------


def _v3_kernel(x_hbm, p_ref, o_ref, xv, sem):
    d2, rt, c = xv.shape          # d2 = 2d (hi plane stacked on lo plane)
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()

    d = d2 // 2
    for r in range(rt):
        oh = _iota_eq(p_ref[r, :], c).astype(jnp.int8)
        both = jnp.dot(xv[:, r, :], oh,
                       preferred_element_type=jnp.int32)   # [2d, W]
        hi = both[:d] + 128                                # undo -128 bias
        lo = both[d:] + 128
        u16 = (hi.astype(jnp.uint32) << 8) | lo.astype(jnp.uint32)
        o_ref[:, r, :] = jax.lax.bitcast_convert_type(
            u16.astype(jnp.uint16), jnp.bfloat16)


def pack_planes(x_bf16):
    """[d, R, C] bf16 -> [2d, R, C] int8 planes (value bytes minus 128)."""
    u16 = jax.lax.bitcast_convert_type(x_bf16, jnp.uint16)
    u = u16.astype(jnp.int32)
    hi = (u >> 8) - 128
    lo = (u & 255) - 128
    return jnp.concatenate([hi, lo], axis=0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=())
def v3_int8(xp, p):
    d2, r, c = xp.shape
    return pl.pallas_call(
        _v3_kernel,
        grid=(r // RT, c // W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((RT, W), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d2 // 2, RT, W), lambda j, i: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d2 // 2, r, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((d2, RT, c), jnp.int8),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(xp, p)


# --------------------------------------------------------------------------
# v5: int4 nibble planes (4x MXU rate if supported), one dot per chunk
# --------------------------------------------------------------------------


def _v5_kernel(x_hbm, p_ref, o_ref, xv, sem):
    d4, rt, c = xv.shape          # d4 = 4d (nibble planes stacked on M)
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()

    d = d4 // 4
    for r in range(rt):
        oh = _iota_eq(p_ref[r, :], c).astype(jnp.int4)
        nib = jnp.dot(xv[:, r, :], oh,
                      preferred_element_type=jnp.int32)    # [4d, W]
        acc = nib[:d] + 8
        for k in range(1, 4):
            acc = (acc << 4) | (nib[k * d:(k + 1) * d] + 8)
        o_ref[:, r, :] = jax.lax.bitcast_convert_type(
            acc.astype(jnp.uint16), jnp.bfloat16)


def pack_nibbles(x_bf16):
    """[d, R, C] bf16 -> [4d, R, C] int4 planes (nibble minus 8)."""
    u = jax.lax.bitcast_convert_type(x_bf16, jnp.uint16).astype(jnp.int32)
    planes = [((u >> (4 * (3 - k))) & 15) - 8 for k in range(4)]
    return jnp.concatenate(planes, axis=0).astype(jnp.int4)


@jax.jit
def v5_int4(xp, p):
    d4, r, c = xp.shape
    return pl.pallas_call(
        _v5_kernel,
        grid=(r // RT, c // W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((RT, W), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d4 // 4, RT, W), lambda j, i: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d4 // 4, r, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((d4, RT, c), jnp.int4),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(xp, p)


# --------------------------------------------------------------------------
# v4: in-kernel dynamic gather along lanes (no one-hot, no MXU)
# --------------------------------------------------------------------------


def _v4_kernel(x_ref, p_ref, o_ref):
    d, rt, c = x_ref.shape
    for r in range(rt):
        idx = jnp.broadcast_to(p_ref[r, :].reshape(1, c), (d, c))
        o_ref[:, r, :] = jnp.take_along_axis(x_ref[:, r, :], idx, axis=1)


def _v4_call(x, p, dtype):
    d, r, c = x.shape
    return pl.pallas_call(
        _v4_kernel,
        grid=(r // RT,),
        in_specs=[pl.BlockSpec((d, RT, c), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((RT, c), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, RT, c), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), dtype),
        compiler_params=_VMEM,
    )(x, p)


@jax.jit
def v4_gather_bf16(x, p):
    return _v4_call(x, p, jnp.bfloat16)


@jax.jit
def v4_gather_f32(x, p):
    return _v4_call(x.astype(jnp.float32), p, jnp.float32
                    ).astype(jnp.bfloat16)


@jax.jit
def v4_gather_int8(x, p):
    """Gather the two int8 byte planes, recombine to bf16."""
    xp = pack_planes(x)
    out = _v4_call(xp, p, jnp.int8)
    d2 = out.shape[0]
    hi = out[:d2 // 2].astype(jnp.int32) + 128
    lo = out[d2 // 2:].astype(jnp.int32) + 128
    u16 = ((hi << 8) | lo).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(u16, jnp.bfloat16)


@jax.jit
def v4_gather_pack32(x, p):
    """Pack bf16 feature pairs into int32 lanes, gather 32-bit, unpack."""
    d, r, c = x.shape
    u = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.uint32)
    packed = jax.lax.bitcast_convert_type(
        (u[0::2] | (u[1::2] << 16)).astype(jnp.uint32), jnp.int32)
    out = _v4_call(packed, p, jnp.int32)
    ou = jax.lax.bitcast_convert_type(out, jnp.uint32)
    lo = (ou & 0xFFFF).astype(jnp.uint16)
    hi = (ou >> 16).astype(jnp.uint16)
    y = jnp.stack([lo, hi], axis=1).reshape(d, r, c)
    return jax.lax.bitcast_convert_type(y, jnp.bfloat16)


# --------------------------------------------------------------------------


def amortized(fn, args, iters=20):
    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            out = fn(c, *rest)
            return c * (1 + 0 * out[0, 0, 0].astype(c.dtype)), out[0, 0, :1]
        c, s = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(s[-1].astype(jnp.float32))

    t0 = time.time()
    out = loop(*args)
    _ = float(out)
    compile_s = time.time() - t0
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / iters * 1e3, compile_s


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 9856
    d = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((d, rows, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    p = jnp.asarray(np.stack([rng.permutation(c) for _ in range(rows)])
                    .astype(np.int32))
    want = np.take_along_axis(np.asarray(x),
                              np.broadcast_to(np.asarray(p)[None],
                                              x.shape), axis=2)

    results = {"shape": f"d={d} rows={rows} c={c}",
               "entries": rows * c}

    def run(name, fn, args, check):
        try:
            got = np.asarray(check(*args))
        except Exception as err:  # noqa: BLE001
            lines = str(err).splitlines() or [repr(err)]
            msg = next((ln for ln in lines if ln.strip()), repr(err))[:160]
            results[name] = f"ERROR: {msg}"
            print(name, results[name], flush=True)
            return
        ok = np.array_equal(got, want)
        ms, comp = amortized(fn, args)
        results[name] = {"ms": round(ms, 2), "compile_s": round(comp, 1),
                         "exact": bool(ok)}
        if not ok:
            results[name]["max_diff"] = float(
                np.abs(got.astype(np.float32) - want.astype(np.float32))
                .max())
        print(name, results[name], flush=True)

    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    def want_run(name):
        return only is None or name in only

    if want_run("v1_dma"):
        run("v1_dma", v1_dma, (x, p), v1_dma)
    if want_run("v2_fori"):
        run("v2_fori", v2_fori, (x, p), v2_fori)
    if want_run("v3_int8"):
        xp = jax.jit(pack_planes)(x)
        xp.block_until_ready()
        run("v3_int8", v3_int8, (xp, p), v3_int8)
    if want_run("v5_int4"):
        xn = jax.jit(pack_nibbles)(x)
        xn.block_until_ready()
        run("v5_int4", v5_int4, (xn, p), v5_int4)
    if want_run("v4_bf16"):
        run("v4_bf16", v4_gather_bf16, (x, p), v4_gather_bf16)
    if want_run("v4_f32"):
        run("v4_f32", v4_gather_f32, (x, p), v4_gather_f32)
    if want_run("v4_int8"):
        run("v4_int8", v4_gather_int8, (x, p), v4_gather_int8)
    if want_run("v4_pack32"):
        run("v4_pack32", v4_gather_pack32, (x, p), v4_gather_pack32)

    print(json.dumps(results, indent=1))
    with open("/root/repo/docs/LONGROW_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
