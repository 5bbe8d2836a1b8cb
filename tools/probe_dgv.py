"""Round-4 probe 3: VECTORIZED dynamic-gather stage kernel (dgv).

Every shipped dg kernel (permute.py `_dg_kernel`/`_tlp_dg_kernel`) loops
per ROW inside the block, extracting [d, 1, C] slabs — a sublane-boundary
relayout per row plus per-row index prep. The mux-tree experiment showed
the kernels are NOT vector-issue-bound (halving vreg work gained 8%), so
the suspect is exactly this per-row fixed cost (~1 us/row at the bench
shape: 2048 rows x ~1.18 us = the whole 2.41 ms pass).

Hypothesis: `tpu.dynamic_gather` takes a full [S, L] index OPERAND, so
per-SUBLANE indices should be legal — meaning the whole [d, rows, C]
block can be permuted with b=C/128 full-block gathers and one shared
mux tree, no row loop at all. Two formulations:

  dgv_merge  reshape [d, rows, C] -> [d*rows, C] (layout-preserving for
             rows % 8 == 0: c stays the lane dim, tiles are reindexed) and
             gather with index planes broadcast along the d-major dim.
  dgv_dloop  short python loop over d: x_ref[di] is a [rows, C] major-dim
             slice (no relayout) gathered with the [rows, C] index planes
             used DIRECTLY per sublane — d iterations instead of `rows`.

bf16 variants upcast to f32 in VMEM (exact: pure data movement; 16-bit
indices don't survive lowering — docs/DG2_PROBE.json).

Writes docs/DGV_PROBE.json. Run alone on the TPU.
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

from ihgnn_tpu.ops.pallas.permute import (_RLP_VMEM, DG_W,
                                          row_local_permute_dg)

R, C, D = 2048, 1024, 32
ITERS = 30


def _bcast_idx(v, d):
    """[rows, w] int32 -> [d*rows, w]: replicate along the d-major dim
    (tile copies; no sublane/lane rearrangement)."""
    rows, w = v.shape
    return jnp.broadcast_to(v[None], (d, rows, w)).reshape(d * rows, w)


def _dgv_body(x2, word, w, d_rep):
    """Full-block permute of x2 [S, C] with hier words [rows, C]
    (S = d_rep*rows; d_rep = 1 when indices already align per sublane)."""
    c = x2.shape[1]
    b = c // w
    p0 = word & 1023
    s = (word >> 10) & 1023
    p2 = word >> 20

    def idx(v):
        return _bcast_idx(v, d_rep) if d_rep > 1 else v

    a0 = [jnp.take_along_axis(x2[:, j * w:(j + 1) * w],
                              idx(p0[:, j * w:(j + 1) * w]), axis=1)
          for j in range(b)]
    outs = []
    for bb in range(b):
        sb = idx(s[:, bb * w:(bb + 1) * w])
        if b & (b - 1) == 0 and b > 1:
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
        outs.append(jnp.take_along_axis(
            acc, idx(p2[:, bb * w:(bb + 1) * w]), axis=1))
    return jnp.concatenate(outs, axis=1)


def _dgv_merge_kernel(x_ref, p_ref, o_ref, *, w):
    d, rows, c = x_ref.shape
    x2 = x_ref[...].reshape(d * rows, c)
    if x2.dtype != jnp.float32:
        x2 = x2.astype(jnp.float32)
    out = _dgv_body(x2, p_ref[...], w, d_rep=d)
    o_ref[...] = out.astype(o_ref.dtype).reshape(d, rows, c)


def _dgv_dloop_kernel(x_ref, p_ref, o_ref, *, w):
    d, rows, c = x_ref.shape
    word = p_ref[...]
    for di in range(d):
        x2 = x_ref[di]
        if x2.dtype != jnp.float32:
            x2 = x2.astype(jnp.float32)
        o_ref[di] = _dgv_body(x2, word, w, d_rep=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant", "rows"))
def rlp_dgv(x, packed, variant: str = "merge", rows: int = 64):
    d, r, c = x.shape
    kern = {"merge": _dgv_merge_kernel, "dloop": _dgv_dloop_kernel}[variant]
    return pl.pallas_call(
        functools.partial(kern, w=DG_W),
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


def amortized(fn, x0, *aux, iters=ITERS):
    @jax.jit
    def loop(x, *aux):
        def body(carry, _):
            y = fn(carry, *aux)
            s = y[0, 0, :1].astype(jnp.float32)
            return (carry * (1 + 0 * s[0]).astype(carry.dtype)), s
        carry, s = jax.lax.scan(body, x, None, length=iters)
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
    t = native.route_rows_hier(perm, DG_W)
    packed = jnp.asarray(t if t is not None else rrh_np(perm, DG_W))
    print("# tables ready", flush=True)

    results = {"config": f"R={R} C={C} d={D} iters={ITERS} w={DG_W}"}

    xf = jnp.asarray(rng.standard_normal((D, R, C)).astype(np.float32))
    xb = xf.astype(jnp.bfloat16)
    # reference: the shipped per-row dg kernel (itself checked against
    # unpack_stage_perm in tests)
    ref_f = row_local_permute_dg(xf, packed)
    ref_b = row_local_permute_dg(xb, packed)

    def run(name, fn, x, *aux, ref=None):
        try:
            y = fn(x, *aux)
            if ref is not None:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                results[name + "_maxerr"] = err
            ms = amortized(fn, x, *aux)
            results[name] = round(ms, 3)
            print(f"{name:26s} {ms:8.3f} ms  maxerr="
                  f"{results.get(name + '_maxerr')}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name:26s} {results[name][:120]}", flush=True)
            traceback.print_exc(limit=2)

    # baseline: the shipped per-row kernel
    run("dg_perrow_f32", functools.partial(row_local_permute_dg), xf,
        packed, ref=ref_f)
    run("dg_perrow_bf16", functools.partial(row_local_permute_dg), xb,
        packed, ref=ref_b)

    for rows in (32, 64, 128):
        run(f"dgv_merge_f32_r{rows}",
            functools.partial(rlp_dgv, variant="merge", rows=rows),
            xf, packed, ref=ref_f)
    run("dgv_merge_bf16_r64",
        functools.partial(rlp_dgv, variant="merge", rows=64),
        xb, packed, ref=ref_b)
    run("dgv_dloop_f32_r128",
        functools.partial(rlp_dgv, variant="dloop", rows=128),
        xf, packed, ref=ref_f)
    run("dgv_dloop_f32_r256",
        functools.partial(rlp_dgv, variant="dloop", rows=256),
        xf, packed, ref=ref_f)

    with open("/root/repo/docs/DGV_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
