"""Round-4 probe: alternative row-local permute primitives, measured.

VERDICT r3 items 1a/1b: the step is permute-stage-bound (~2.3-2.5 ms per
hier stage pass at the bench shape [32, 2048, 1024]); round 3 attributed
the cost to mask builds + per-matmul issue overhead ("issue/VPU-bound").
The alternatives were never successfully measured — the dynamic-gather
probe died on remote-compile-helper HTTP 500s (docs/DYNGATHER_PROBE.json)
and the butterfly kernels were only ever run through pltpu.roll /
tpu.dynamic_rotate (broken: slow, f32-only, compiled-vs-interpret
disagreement; docs/KERNELS.md).

This probe measures, at the REAL bench stage shape, with correctness
checked on-chip against an XLA take_along_axis oracle:

  hier_w256      production baseline (two one-hot levels + exchange)
  hier_i16       hier with int16 mask compares (mask build is ~45% of
                 the modeled cost; int16 halves compare bytes)
  flat_1dot      ONE [d, C]x[C, C] one-hot dot per row (8x fewer matmul
                 issues than flat-chunked, 2x hier's mask elements)
  bfly_static    butterfly roll+select with STATIC-SLICE rolls
                 (jnp.concatenate of lane slices — no tpu.dynamic_rotate)
  hier_dg128     hier W=128 with the one-hot level replaced by in-kernel
                 jnp.take_along_axis on [d, 128] blocks (the lowering
                 regime docs/LONGROW_PROBE.json noted as the only legal
                 tpu.dynamic_gather configuration: f32, 128-lane rows)
  dg_row         in-kernel take_along_axis over full 1024-lane rows

Each variant records either a time or the compile error string — a
failed compile is recorded, never silently skipped.

Run alone on the TPU (single-tenant; CLAUDE.md). Writes
docs/STAGE_VARIANTS.json.
"""

from __future__ import annotations

import functools
import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.ops.pallas.permute import (_RLP_VMEM, CHUNK, _rlp_rows,
                                          row_local_permute,
                                          row_local_permute_hier)

R, C, D = 2048, 1024, 32
ITERS = 30


# ---------------------------------------------------------------------------
# variant kernels (self-contained; promoted into ops/pallas/permute.py only
# if they win)
# ---------------------------------------------------------------------------


def _hier_kernel_i16(x_ref, p_ref, o_ref, *, w: int):
    """hier kernel with int16 iota/index compares for the mask builds."""
    d, rows, c = x_ref.shape
    b = c // w
    bf16_in = x_ref.dtype == jnp.bfloat16
    iota16 = jax.lax.broadcasted_iota(jnp.int16, (w, w), 0)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, lo], axis=0)

    def onehot_dot(vals, p_slice):
        oh = (iota16 == p_slice.astype(jnp.int16).reshape(1, w)
              ).astype(jnp.bfloat16)
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


@functools.partial(jax.jit, static_argnames=("w",))
def rlp_hier_i16(x, packed, w: int = 256):
    d, r, c = x.shape
    rows = _rlp_rows(d, r, c, x.dtype)
    return pl.pallas_call(
        functools.partial(_hier_kernel_i16, w=w),
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
    )(x, packed)


def _flat_1dot_kernel(x_ref, p_ref, o_ref):
    """One depth-C one-hot dot per row (C output lanes at once)."""
    d, rows, c = x_ref.shape
    bf16_in = x_ref.dtype == jnp.bfloat16
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    for r in range(rows):
        x = x_ref[:, r, :]
        if bf16_in:
            xs = x
        else:
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            xs = jnp.concatenate([xhi, xlo], axis=0)
        oh = (iota == p_ref[r, :].reshape(1, c)).astype(jnp.bfloat16)
        both = jnp.dot(xs, oh, preferred_element_type=jnp.float32)
        out = both if bf16_in else both[:d] + both[d:]
        o_ref[:, r, :] = out.astype(o_ref.dtype)


@jax.jit
def rlp_flat_1dot(x, p):
    d, r, c = x.shape
    rows = min(8, _rlp_rows(d, r, c, x.dtype))   # [C, C] mask is 2 MB
    return pl.pallas_call(
        _flat_1dot_kernel,
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
    )(x, p)


# --- butterfly with static-slice rolls -------------------------------------

BFLY_STAGES = 13
BFLY_SHIFTS = (64, 32, 16, 8, 4, 2, 1, 2, 4, 8, 16, 32, 64)
HIER_W = 128


def _roll_static(x, m):
    """y[..., i] = x[..., (i - m) % c] via two static lane slices."""
    if m == 0:
        return x
    return jnp.concatenate([x[..., -m:], x[..., :-m]], axis=-1)


def _bfly_apply_static(x, bits):
    c = x.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    for t, m in enumerate(BFLY_SHIFTS):
        hi = (lane & m) != 0
        sw = ((bits >> t) & 1)[None] != 0
        partner = jnp.where(hi, _roll_static(x, m), _roll_static(x, c - m))
        x = jnp.where(sw, partner, x)
    return x


def _bfly_static_kernel(x_ref, p_ref, o_ref):
    x = x_ref[...]
    word = p_ref[...]
    c = x.shape[2]
    b = c // HIER_W
    a = _bfly_apply_static(x, word & 0x1FFF)
    if b > 1:
        delta = ((word >> BFLY_STAGES) & 15)[None]
        acc = a
        for dd in range(1, b):
            acc = jnp.where(delta == dd,
                            _roll_static(a, c - dd * HIER_W), acc)
    else:
        acc = a
    o_ref[...] = _bfly_apply_static(acc, word >> (BFLY_STAGES + 4))


@jax.jit
def rlp_bfly_static(x, words):
    d, r, c = x.shape
    rows = min(16 if x.dtype == jnp.bfloat16 else 8, r)
    return pl.pallas_call(
        _bfly_static_kernel,
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
    )(x, words)


# --- in-kernel dynamic gather variants --------------------------------------


def _hier_dg_kernel(x_ref, p_ref, o_ref, *, w: int):
    """hier structure with take_along_axis replacing the one-hot dots."""
    d, rows, c = x_ref.shape
    b = c // w

    def dyn(vals, p_slice):
        idx = jnp.broadcast_to(p_slice.reshape(1, w), (vals.shape[0], w))
        return jnp.take_along_axis(vals, idx, axis=1)

    for r in range(rows):
        x = x_ref[:, r, :]
        word = p_ref[r, :]
        p0 = word & 1023
        s = (word >> 10) & 1023
        p2 = word >> 20
        a0 = [dyn(x[:, j * w:(j + 1) * w], p0[j * w:(j + 1) * w])
              for j in range(b)]
        for bb in range(b):
            sb = s[bb * w:(bb + 1) * w].reshape(1, w)
            acc = a0[0]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[j], acc)
            o_ref[:, r, bb * w:(bb + 1) * w] = dyn(acc, p2[bb * w:(bb + 1) * w])


@functools.partial(jax.jit, static_argnames=("w",))
def rlp_hier_dg(x, packed, w: int = 128):
    d, r, c = x.shape
    rows = _rlp_rows(d, r, c, x.dtype)
    return pl.pallas_call(
        functools.partial(_hier_dg_kernel, w=w),
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
    )(x, packed)


def _dg_row_kernel(x_ref, p_ref, o_ref):
    d, rows, c = x_ref.shape
    for r in range(rows):
        idx = jnp.broadcast_to(p_ref[r, :].reshape(1, c), (d, c))
        o_ref[:, r, :] = jnp.take_along_axis(x_ref[:, r, :], idx, axis=1)


@jax.jit
def rlp_dg_row(x, p):
    d, r, c = x.shape
    rows = _rlp_rows(d, r, c, x.dtype)
    return pl.pallas_call(
        _dg_row_kernel,
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), x.dtype),
        compiler_params=_RLP_VMEM,
    )(x, p)


# ---------------------------------------------------------------------------


def amortized(fn, x0, *aux, iters=ITERS):
    @jax.jit
    def loop(x, *aux):
        def body(c, _):
            y = fn(c, *aux)
            s = y[0, 0, :1].astype(jnp.float32)
            return (c * (1 + 0 * s[0]).astype(c.dtype)), s
        c, s = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(s[-1])

    out = loop(x0, *aux)
    _ = float(out)
    t0 = time.time()
    _ = float(loop(x0, *aux))
    return (time.time() - t0) / iters * 1e3


def main():
    global R, ITERS
    if "--interpret" in sys.argv:
        # CPU smoke run: force every pallas_call into interpret mode (the
        # `pl` module object is shared with ops/pallas/*, so patching the
        # attribute covers the imported kernels too)
        jax.config.update("jax_platforms", "cpu")
        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        R, ITERS = 128, 2

    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.benes import route_rows_hier as rrh_np
    from ihgnn_tpu.ops.bfly import route_rows_bfly as rrb_np

    rng = np.random.default_rng(0)
    perm = np.stack([rng.permutation(C) for _ in range(R)]).astype(np.int32)
    print("# routing tables...", flush=True)
    h256 = native.route_rows_hier(perm, 256)
    if h256 is None:
        h256 = rrh_np(perm, 256)
    h128 = native.route_rows_hier(perm, 128)
    if h128 is None:
        h128 = rrh_np(perm, 128)
    bw = native.route_rows_bfly(perm)
    if bw is None:
        bw = rrb_np(perm)
    print("# tables ready", flush=True)

    h256j = jnp.asarray(h256)
    h128j = jnp.asarray(h128)
    bwj = jnp.asarray(bw)
    permj = jnp.asarray(perm)

    results = {"config": f"R={R} C={C} d={D} iters={ITERS}"}

    def run(name, fn, x, *aux, ref=None):
        try:
            y = fn(x, *aux)
            if ref is not None:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                results[name + "_maxerr"] = err
                if err > 0:
                    print(f"{name}: MISMATCH maxerr={err}", flush=True)
            ms = amortized(fn, x, *aux)
            results[name] = round(ms, 3)
            print(f"{name:28s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — record, don't die
            msg = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            results[name] = msg
            print(f"{name:28s} {msg}", flush=True)
            traceback.print_exc(limit=2)

    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = jnp.asarray(rng.standard_normal((D, R, C)).astype(np.float32)
                        ).astype(dt)
        ref = jnp.take_along_axis(
            x, jnp.broadcast_to(permj[None], x.shape), axis=2)

        run(f"hier_w256_{tag}",
            functools.partial(row_local_permute_hier, w=256), x, h256j,
            ref=ref)
        run(f"hier_i16_{tag}", rlp_hier_i16, x, h256j, ref=ref)
        run(f"flat_chunked_{tag}", row_local_permute, x, permj, ref=ref)
        run(f"flat_1dot_{tag}", rlp_flat_1dot, x, permj, ref=ref)
        run(f"bfly_static_{tag}", rlp_bfly_static, x, bwj, ref=ref)
        run(f"hier_dg128_{tag}",
            functools.partial(rlp_hier_dg, w=128), x, h128j, ref=ref)
        run(f"dg_row_{tag}", rlp_dg_row, x, permj, ref=ref)

    print(json.dumps(results, indent=1))
    with open("/root/repo/docs/STAGE_VARIANTS.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
