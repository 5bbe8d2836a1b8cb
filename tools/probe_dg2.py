"""Round-4 probe 2: dynamic-gather permute refinements.

probe_stage_variants.py measured hier_dg128_f32 at 2.86 ms vs the one-hot
hier's 3.89 (exact, no hi/lo split) and showed bf16 fails only on
"Gather indices and result have different bitwidths". This probe chases
the full prize:

  dgb_f32_w128    stage A/B as FULL-BLOCK take_along_axis (no per-row
                  python loop: one 3D gather per [d, rows, w] block)
  dgb_f32_w256    same with W=256 blocks (fewer exchange selects)
  dgb_bf16_i16    bf16 data with int16 indices (bitwidth-matched)
  dgb_bf16_i32up  bf16 upcast to f32 in-VMEM, 32-bit gather, downcast
  tlp_dg_f32/bf16 fused permute+transpose built on the block dyngather
                  (the rlp+bt pair is ~16 passes/step — fusing halves
                  its HBM traffic IF the body stays full-block code)

Writes docs/DG2_PROBE.json. Run alone on the TPU.
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

from ihgnn_tpu.ops.pallas.permute import (_RLP_VMEM, _rlp_rows,
                                          row_local_permute_hier)

R, C, D = 2048, 1024, 32
ITERS = 30
TLP_RT = 128


def _row_gather(vals2d, idx1d, idx_dtype):
    """vals [d, w]; idx [w] int32 → vals[:, idx[c]] as a 2D
    take_along_axis (Mosaic: "Only 2D gather is supported")."""
    ib = jnp.broadcast_to(idx1d[None].astype(idx_dtype), vals2d.shape)
    return jnp.take_along_axis(vals2d, ib, axis=1)


def _dgb_kernel(x_ref, p_ref, o_ref, *, w: int, idx_dtype, upcast: bool):
    d, rows, c = x_ref.shape
    b = c // w
    for r in range(rows):
        x = x_ref[:, r, :]
        if upcast:
            x = x.astype(jnp.float32)
        word = p_ref[r, :]
        p0 = word & 1023
        s = (word >> 10) & 1023
        p2 = word >> 20
        a0 = [_row_gather(x[:, j * w:(j + 1) * w],
                          p0[j * w:(j + 1) * w], idx_dtype)
              for j in range(b)]
        for bb in range(b):
            sb = s[bb * w:(bb + 1) * w].reshape(1, w)
            acc = a0[0]
            for j in range(1, b):
                acc = jnp.where(sb == j, a0[j], acc)
            out = _row_gather(acc, p2[bb * w:(bb + 1) * w], idx_dtype)
            o_ref[:, r, bb * w:(bb + 1) * w] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w", "idx16", "upcast"))
def rlp_dgb(x, packed, w: int = 128, idx16: bool = False,
            upcast: bool = False):
    d, r, c = x.shape
    rows = _rlp_rows(d, r, c, x.dtype)
    idx_dtype = jnp.int16 if idx16 else jnp.int32
    return pl.pallas_call(
        functools.partial(_dgb_kernel, w=w, idx_dtype=idx_dtype,
                          upcast=upcast),
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


# --- fused TLP on the block dyngather: permute a [d, RT, C] row tile at
# i == 0 into scratch, then store transposed [d, CHUNK, RT] blocks --------

CHUNK = 128
_TLP_BUDGET = 96 << 20


def _tlp_dg_kernel(x_hbm, p_ref, o_ref, xv, y_ref, sem, *, w: int,
                   idx_dtype):
    d, rt, c = xv.shape
    b = c // w
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch_and_permute():
        dma = pltpu.make_async_copy(x_hbm.at[:, pl.ds(j * rt, rt), :],
                                    xv, sem)
        dma.start()
        dma.wait()
        grp = 16
        def body(g, _):
            rows_sl = pl.ds(g * grp, grp)
            xg = xv[:, rows_sl, :]
            wordg = p_ref[rows_sl, :]
            outs = []
            for rr in range(grp):
                x = xg[:, rr, :]
                word = wordg[rr, :]
                p0 = word & 1023
                s = (word >> 10) & 1023
                p2 = word >> 20
                a0 = [_row_gather(x[:, jj * w:(jj + 1) * w],
                                  p0[jj * w:(jj + 1) * w], idx_dtype)
                      for jj in range(b)]
                row_out = []
                for bb in range(b):
                    sb = s[bb * w:(bb + 1) * w].reshape(1, w)
                    acc = a0[0]
                    for jj in range(1, b):
                        acc = jnp.where(sb == jj, a0[jj], acc)
                    row_out.append(_row_gather(acc, p2[bb * w:(bb + 1) * w],
                                               idx_dtype))
                outs.append(jnp.concatenate(row_out, axis=1))
            xv[:, rows_sl, :] = jnp.stack(outs, axis=1)
            return 0

        jax.lax.fori_loop(0, rt // grp, body, 0, unroll=False)

    off = pl.multiple_of(i * CHUNK, CHUNK)
    y_ref[...] = xv[:, :, pl.ds(off, CHUNK)]
    o_ref[...] = jnp.swapaxes(y_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("w", "idx16"))
def tlp_dg(x, packed, w: int = 128, idx16: bool = False):
    d, r, c = x.shape
    idx_dtype = jnp.int16 if idx16 else jnp.int32
    return pl.pallas_call(
        functools.partial(_tlp_dg_kernel, w=w, idx_dtype=idx_dtype),
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
    )(x, packed)


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
    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.benes import route_rows_hier as rrh_np

    rng = np.random.default_rng(0)
    perm = np.stack([rng.permutation(C) for _ in range(R)]).astype(np.int32)
    print("# routing tables...", flush=True)
    h = {}
    for w in (128, 256):
        t = native.route_rows_hier(perm, w)
        h[w] = jnp.asarray(t if t is not None else rrh_np(perm, w))
    permj = jnp.asarray(perm)
    print("# tables ready", flush=True)

    results = {"config": f"R={R} C={C} d={D} iters={ITERS}"}

    def run(name, fn, x, *aux, ref=None, transposed=False):
        try:
            y = fn(x, *aux)
            if ref is not None:
                yy = jnp.swapaxes(y, 1, 2) if transposed else y
                err = float(jnp.max(jnp.abs(
                    yy.astype(jnp.float32) - ref.astype(jnp.float32))))
                results[name + "_maxerr"] = err
            ms = amortized(fn, x, *aux)
            results[name] = round(ms, 3)
            print(f"{name:24s} {ms:8.3f} ms  maxerr="
                  f"{results.get(name + '_maxerr')}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name:24s} {results[name][:120]}", flush=True)
            traceback.print_exc(limit=2)

    for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jnp.asarray(rng.standard_normal((D, R, C)).astype(np.float32)
                        ).astype(dt)
        ref = jnp.take_along_axis(
            x, jnp.broadcast_to(permj[None], x.shape), axis=2)

        run(f"hier_onehot_w256_{tag}",
            functools.partial(row_local_permute_hier, w=256), x, h[256],
            ref=ref)
        if dt == jnp.float32:
            run(f"dgb_{tag}_w128", functools.partial(rlp_dgb, w=128),
                x, h[128], ref=ref)
            run(f"dgb_{tag}_w256", functools.partial(rlp_dgb, w=256),
                x, h[256], ref=ref)
            run(f"tlp_dg_{tag}", functools.partial(tlp_dg, w=128),
                x, h[128], ref=ref, transposed=True)
        else:
            run(f"dgb_{tag}_i16_w128",
                functools.partial(rlp_dgb, w=128, idx16=True),
                x, h[128], ref=ref)
            run(f"dgb_{tag}_i16_w256",
                functools.partial(rlp_dgb, w=256, idx16=True),
                x, h[256], ref=ref)
            run(f"dgb_{tag}_i32up_w128",
                functools.partial(rlp_dgb, w=128, upcast=True),
                x, h[128], ref=ref)
            run(f"tlp_dg_{tag}_i16",
                functools.partial(tlp_dg, w=128, idx16=True),
                x, h[128], ref=ref, transposed=True)

    print(json.dumps(results, indent=1))
    with open("/root/repo/docs/DG2_PROBE.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
