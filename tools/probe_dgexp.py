"""Round-4 probe 4: dynamic-gather windowed EXPAND (dg applied to the
banded gather kernels, after DGV removed the stage kernels' per-row tax).

Every role chain starts with a windowed expand (plain for the u role,
fused-transposed for q/i) built from per-row depth-w one-hot MXU matmuls
— ~6 expand passes per layer fwd+bwd, each carrying the same ~1 us/row
fixed cost the stage kernels had. With w = b*128 blocks, the expand is
exactly the dgv pattern: b full-block lane-gathers (lo = idx & 127) + a
b-way select (hi = idx >> 7), per-sublane indices, no MXU at all (and
EXACT for f32 — no bf16 hi/lo split).

Two scratch layouts probed (the open question is the window DMA):
  A "dmaj"  xwin [d, RT, w]; per-row DMA lands at .at[:, rr, :] — a
            d-segment strided dest. Output [d, RT, CHUNK] falls out of
            the merged (d-major) compute with NO transpose.
  B "rmaj"  xwin [RT, d, w] (contiguous per-row dest, like the shipped
            kernels); indices broadcast along the MIDDLE dim and the
            output pays a [RT, d, CHUNK] -> [d, RT, CHUNK] relayout.

Writes docs/DGEXP_PROBE.json. Run alone on the TPU.
"""

from __future__ import annotations

import functools
import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.ops.pallas.gather import (CHUNK, expand_pack,
                                         windowed_gather,
                                         windowed_gather_t)

D = 32
ITERS = 30
RT = 128


def _sel_tree(a0, hi, w):
    """Select a0[hi[s, l]][s, l] from the b gathered blocks."""
    b = len(a0)
    if b == 1:
        return a0[0]
    if b & (b - 1) == 0:
        cur = list(a0)
        k = 0
        while len(cur) > 1:
            m = ((hi >> k) & 1) == 1
            cur = [jnp.where(m, cur[j + 1], cur[j])
                   for j in range(0, len(cur), 2)]
            k += 1
        return cur[0]
    acc = a0[0]
    for j in range(1, b):
        acc = jnp.where(hi == j, a0[j], acc)
    return acc


def _dg_expand_block(x2, rel_b, w):
    """x2 [S, w] f32; rel_b [S, CHUNK] int32 (< w) → [S, CHUNK]:
    out[s, l] = x2[s, rel_b[s, l]]."""
    b = w // CHUNK
    lo = rel_b & (CHUNK - 1)
    hi = rel_b >> 7
    a0 = [jnp.take_along_axis(x2[:, k * CHUNK:(k + 1) * CHUNK], lo, axis=1)
          for k in range(b)]
    return _sel_tree(a0, hi, w)


def _dmaj_kernel(win_ref, idx_ref, x_hbm, o_ref, xwin, sems, *, w,
                 transposed):
    d, rt, _ = xwin.shape
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
        def start(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[:, rr], sems.at[rr]).start()
            return 0

        jax.lax.fori_loop(0, rt, start, 0, unroll=False)

        def wait(rr, _):
            off = pl.multiple_of(win_ref[j * rt + rr], CHUNK)
            pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, w)],
                                  xwin.at[:, rr], sems.at[rr]).wait()
            return 0

        jax.lax.fori_loop(0, rt, wait, 0, unroll=False)

    x2 = xwin[...]
    if x2.dtype != jnp.float32:
        x2 = x2.astype(jnp.float32)
    x2 = x2.reshape(d * rt, w)
    rel = idx_ref[...]                             # [rt, CHUNK]
    rel_b = jnp.broadcast_to(rel[None], (d, rt, CHUNK)).reshape(
        d * rt, CHUNK)
    y = _dg_expand_block(x2, rel_b, w).astype(o_ref.dtype).reshape(
        d, rt, CHUNK)
    o_ref[...] = jnp.swapaxes(y, 1, 2) if transposed else y


def _rmaj_kernel(win_ref, idx_ref, x_hbm, o_ref, xwin, sems, *, w,
                 transposed):
    rt, d, _ = xwin.shape
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _fetch():
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

    x2 = xwin[...]
    if x2.dtype != jnp.float32:
        x2 = x2.astype(jnp.float32)
    x2 = x2.reshape(rt * d, w)
    rel = idx_ref[...]                             # [rt, CHUNK]
    rel_b = jnp.broadcast_to(rel[:, None, :], (rt, d, CHUNK)).reshape(
        rt * d, CHUNK)
    y = _dg_expand_block(x2, rel_b, w).astype(o_ref.dtype).reshape(
        rt, d, CHUNK)
    y = jnp.swapaxes(y, 0, 1)                      # [d, rt, CHUNK]
    o_ref[...] = jnp.swapaxes(y, 1, 2) if transposed else y


@functools.partial(jax.jit, static_argnames=("w", "variant", "transposed"))
def dg_expand(x_t, idx_rel, win, w: int, variant: str = "dmaj",
              transposed: bool = False):
    d, n_pad = x_t.shape
    r, n_chunks, _ = idx_rel.shape
    c = n_chunks * CHUNK
    kern = {"dmaj": _dmaj_kernel, "rmaj": _rmaj_kernel}[variant]
    xwin_shape = (d, RT, w) if variant == "dmaj" else (RT, d, w)
    if transposed:
        out_shape = jax.ShapeDtypeStruct((d, c, r), x_t.dtype)
        out_spec = pl.BlockSpec((d, CHUNK, RT), lambda j, i, win: (0, i, j),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((d, r, c), x_t.dtype)
        out_spec = pl.BlockSpec((d, RT, CHUNK), lambda j, i, win: (0, j, i),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // RT, n_chunks),
        in_specs=[
            pl.BlockSpec((RT, CHUNK), lambda j, i, win: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM(xwin_shape, x_t.dtype),
            pltpu.SemaphoreType.DMA((RT,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(kern, w=w, transposed=transposed),
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(win, idx_rel.reshape(r, c), x_t)
    return out if transposed else out.reshape(d, r * c)


def amortized(fn, *args, iters=ITERS):
    @jax.jit
    def loop(x, *aux):
        def body(carry, _):
            y = fn(carry, *aux)
            s = y.reshape(-1)[:1].astype(jnp.float32)
            return (carry * (1 + 0 * s[0]).astype(carry.dtype)), s
        carry, s = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(s[-1])

    out = loop(*args)
    _ = float(out)
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    K, N = 2 * 1024 * 1024, 700 * 1024
    ids = np.sort(rng.integers(0, N, K))
    pack, k_pad = expand_pack(ids, c=1024)
    w = pack.w
    r = pack.rows
    src_pad = ((pack.src_pad + 127) // 128) * 128
    print(f"# rows={r} cols={pack.cols} w={w} src_pad={src_pad}",
          flush=True)

    results = {"config": f"K={K} N={N} rows={r} w={w} d={D} iters={ITERS}"}

    xf = jnp.asarray(rng.standard_normal((D, src_pad)).astype(np.float32))
    xb = xf.astype(jnp.bfloat16)

    ref_f = windowed_gather(xf, pack.idx_rel, pack.win, w)
    ref_tf = windowed_gather_t(xf, pack.idx_rel, pack.win, w)

    def run(name, fn, *args, ref=None, iters=ITERS):
        try:
            y = fn(*args)
            if ref is not None:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                results[name + "_maxerr"] = err
            ms = amortized(fn, *args, iters=iters)
            results[name] = round(ms, 3)
            print(f"{name:26s} {ms:8.3f} ms  maxerr="
                  f"{results.get(name + '_maxerr')}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name:26s} {results[name][:120]}", flush=True)
            traceback.print_exc(limit=2)

    run("onehot_plain_f32", functools.partial(windowed_gather, w=w),
        xf, pack.idx_rel, pack.win, ref=ref_f)
    run("onehot_plain_bf16", functools.partial(windowed_gather, w=w),
        xb, pack.idx_rel, pack.win)
    run("onehot_t_f32", functools.partial(windowed_gather_t, w=w),
        xf, pack.idx_rel, pack.win, ref=ref_tf)
    run("onehot_t_bf16", functools.partial(windowed_gather_t, w=w),
        xb, pack.idx_rel, pack.win)

    for var in ("dmaj", "rmaj"):
        run(f"dgexp_{var}_plain_f32",
            functools.partial(dg_expand, w=w, variant=var),
            xf, pack.idx_rel, pack.win, ref=ref_f)
        run(f"dgexp_{var}_plain_bf16",
            functools.partial(dg_expand, w=w, variant=var),
            xb, pack.idx_rel, pack.win)
        run(f"dgexp_{var}_t_f32",
            functools.partial(dg_expand, w=w, variant=var, transposed=True),
            xf, pack.idx_rel, pack.win, ref=ref_tf)
        run(f"dgexp_{var}_t_bf16",
            functools.partial(dg_expand, w=w, variant=var, transposed=True),
            xb, pack.idx_rel, pack.win)

    with open("/root/repo/docs/DGEXP_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
