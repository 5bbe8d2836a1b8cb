"""Pallas TPU kernel: fused hyperedge feature interaction.

Computes the IHGNN interaction projection (Models/CommonLayers.py:58-85)

  out = bias + Σ_j  W[jd:(j+1)d]ᵀ · part_j,
  parts(order 3) = [u, q, i, u⊙q, q⊙i, i⊙u, u⊙q⊙i]

without materializing any part: per E-block, the hadamard products live
only in VMEM and feed the MXU directly. The XLA formulation
(models/interaction.py fallback) writes + re-reads every product array —
at d=32, E=2M that is ~2 GB of avoidable HBM traffic per layer forward
and more in backward; fused, the op moves exactly its inputs + outputs
(fwd: 3 reads + 1 write; bwd: 4 reads + 3 writes + param grads).

Precision matches XLA's default MXU contract: operands round to bf16,
accumulation in f32 (CLAUDE.md — same single-pass numerics as the
fallback's ``dot_general`` at default precision).

The backward kernel fuses the data grads (du/dq/di via the product rule)
with the parameter grads: dW/db accumulate in VMEM scratch across the
sequential grid and are written by the last program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BLK = int(os.environ.get("IHGNN_INTERACT_BLK", "2048"))  # edge cols/program

ORDER_PARTS = {1: 3, 2: 6, 3: 7}


def _parts(u, q, i, order):
    parts = [u, q, i]
    if order >= 2:
        parts += [u * q, q * i, i * u]
    if order >= 3:
        parts.append(parts[3] * i)     # u⊙q⊙i
    return parts


def _fwd_kernel(u_ref, q_ref, i_ref, w_ref, b_ref, o_ref, *, order):
    u, q, i = u_ref[...], q_ref[...], i_ref[...]
    d = u.shape[0]
    out_dim, blk = o_ref.shape
    acc = jnp.zeros((out_dim, blk), jnp.float32)
    for j, p in enumerate(_parts(u, q, i, order)):
        kj = w_ref[j * d:(j + 1) * d, :].astype(jnp.bfloat16)     # [d, out]
        acc += jax.lax.dot_general(
            kj, p.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


def _fwd_kernel_batchk(u_ref, q_ref, i_ref, w_ref, b_ref, o_ref, *, order):
    """Batched-K forward: stack the parts on the sublane axis and run ONE
    [n*d → out] matmul. The per-part loop issues n [d=32, out=32] MXU
    matmuls per block — each fills 1/16 of the systolic array (M=K=32);
    stacking raises K to n*d (224 at order 3) for ~n/2x fewer MXU
    cycles. The stack is a bf16 sublane concat (NOT the int8 trap shape;
    validated in the composed bench per CLAUDE.md rule)."""
    u, q, i = u_ref[...], q_ref[...], i_ref[...]
    pstack = jnp.concatenate(
        [p.astype(jnp.bfloat16) for p in _parts(u, q, i, order)], axis=0)
    acc = jax.lax.dot_general(
        w_ref[...].astype(jnp.bfloat16), pstack,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


def _bwd_kernel_batchk(u_ref, q_ref, i_ref, w_ref, c_ref, du_ref, dq_ref,
                       di_ref, dw_ref, db_ref, dw_acc, db_acc, *, order):
    """Batched-K backward: ONE [n*d, out]·[out, BLK] matmul for all
    dparts and ONE [n*d, BLK]·[BLK, out] for dW (the per-part loop
    issues 2n matmuls at M=K=32 — 1/16 MXU occupancy each)."""
    t = pl.program_id(0)
    u, q, i = u_ref[...], q_ref[...], i_ref[...]
    cot = c_ref[...]                                    # [out, BLK]
    cot_b = cot.astype(jnp.bfloat16)
    d = u.shape[0]
    parts = _parts(u, q, i, order)
    if u.dtype == jnp.bfloat16:
        u, q, i = (a.astype(jnp.float32) for a in (u, q, i))

    @pl.when(t == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    pstack = jnp.concatenate([p.astype(jnp.bfloat16) for p in parts],
                             axis=0)                    # [n*d, BLK]
    dp_all = jax.lax.dot_general(                       # [n*d, BLK]
        w_ref[...].astype(jnp.bfloat16), cot_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw_acc[...] += jax.lax.dot_general(                 # [n*d, out]
        pstack, cot_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_acc[...] += jnp.sum(cot.astype(jnp.float32), axis=1, keepdims=True)

    dparts = [dp_all[j * d:(j + 1) * d, :] for j in range(len(parts))]
    du = dparts[0]
    dq = dparts[1]
    di = dparts[2]
    if order >= 2:
        du += dparts[3] * q + dparts[5] * i
        dq += dparts[3] * u + dparts[4] * i
        di += dparts[4] * q + dparts[5] * u
    if order >= 3:
        du += dparts[6] * (q * i)
        dq += dparts[6] * (u * i)
        di += dparts[6] * (u * q)
    du_ref[...] = du.astype(du_ref.dtype)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    di_ref[...] = di.astype(di_ref.dtype)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]


# ---------------------------------------------------------------------------
# i-role final-stage absorption (round 4).
#
# With a σ pack the i role's last Clos stage π = fwd_p2 (and its inverse
# ρ = inv_p2, ρ = π⁻¹ row-locally) are ROW-LOCAL permutes whose rows nest
# inside the interaction block, so both directions absorb into this
# kernel as in-kernel dynamic gathers (permute.py dg machinery):
#   fwd:  reads i in pre-p2 ("t1") order, gathers through π, and emits a
#         SECOND output o2 = ρ(o1) — the exact array the scatter's i
#         chain would otherwise compute with a full rlp pass.
#   bwd:  merges the two cotangents (c_o1 + π-gather(c_o2)), recomputes
#         i_σ from the saved t1 residual, and writes di through ρ so the
#         gather backward consumes it t1-ordered directly.
# Four full [d, E] HBM permute passes per layer fwd+bwd disappear
# (gather's final rlp, scatter-fwd's inv_p2, scatter-bwd's final rlp,
# gather-bwd's inv_p2) for ~4 in-VMEM dg applies.
# ---------------------------------------------------------------------------


def _dg_apply_rows(x, tab_ref, off, cols):
    """Row-local dg permute of a [d, k*cols] block: out[:, r*cols + c] =
    x[:, r*cols + words_perm[r, c]] (permute.py packed word format).
    ``tab_ref`` holds an 8-row-aligned table block (int32 sublane tiling
    forbids 2-row blocks); ``off`` is the program's row offset inside it
    (a multiple of k, so rows stay static for Mosaic)."""
    from ihgnn_tpu.ops.pallas.permute import (DG_W, _dg_narrow,
                                              _dg_permute_row, _dg_widen)
    d, blk = x.shape
    outs = []
    for r in range(blk // cols):
        xr = _dg_widen(x[:, r * cols:(r + 1) * cols])
        word = tab_ref[pl.ds(off + r, 1), :].reshape(cols)
        outs.append(_dg_narrow(_dg_permute_row(xr, word, DG_W), x.dtype))
    return jnp.concatenate(outs, axis=1)


def _tab_off(cols):
    """Row offset of this program's dg words inside its 8-row-aligned
    table block (the table BlockSpec is 8-row granular)."""
    rpb = BLK // cols
    per8 = max(1, 8 // rpb)
    return (pl.program_id(0) % per8) * rpb


def _fwd_kernel_absorb(u_ref, q_ref, i_ref, pi_ref, rho_ref, w_ref, b_ref,
                       o1_ref, o2_ref, *, order, cols):
    u, q = u_ref[...], q_ref[...]
    off = _tab_off(cols)
    i = _dg_apply_rows(i_ref[...], pi_ref, off, cols)      # t1 → σ
    pstack = jnp.concatenate(
        [p.astype(jnp.bfloat16) for p in _parts(u, q, i, order)], axis=0)
    acc = jax.lax.dot_general(
        w_ref[...].astype(jnp.bfloat16), pstack,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o1 = (acc + b_ref[...]).astype(o1_ref.dtype)
    o1_ref[...] = o1
    o2_ref[...] = _dg_apply_rows(o1, rho_ref, off, cols)   # σ → pre-inv_p1


def _bwd_kernel_absorb(u_ref, q_ref, i_ref, pi_ref, rho_ref, w_ref, c1_ref,
                       c2_ref, m_ref, du_ref, dq_ref, di_ref, dw_ref, db_ref,
                       dw_acc, db_acc, *, order, cols, masked):
    t = pl.program_id(0)
    u, q = u_ref[...], q_ref[...]
    off = _tab_off(cols)
    i = _dg_apply_rows(i_ref[...], pi_ref, off, cols)      # recompute i_σ
    # merge the two output cotangents: ∂o2/∂o1 is the ρ-permute, whose
    # VJP is the π-gather. σ-pad positions are masked here (the pre-i
    # cotangent arrives unmasked from the scatter backward).
    cot = c1_ref[...] + _dg_apply_rows(c2_ref[...], pi_ref, off, cols)
    if masked:
        cot = cot * m_ref[...].astype(cot.dtype)
    cot_b = cot.astype(jnp.bfloat16)
    d = u.shape[0]
    parts = _parts(u, q, i, order)
    if u.dtype == jnp.bfloat16:
        u, q, i = (a.astype(jnp.float32) for a in (u, q, i))

    @pl.when(t == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    pstack = jnp.concatenate([p.astype(jnp.bfloat16) for p in parts],
                             axis=0)                    # [n*d, BLK]
    dp_all = jax.lax.dot_general(                       # [n*d, BLK]
        w_ref[...].astype(jnp.bfloat16), cot_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw_acc[...] += jax.lax.dot_general(                 # [n*d, out]
        pstack, cot_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_acc[...] += jnp.sum(cot.astype(jnp.float32), axis=1, keepdims=True)

    dparts = [dp_all[j * d:(j + 1) * d, :] for j in range(len(parts))]
    du = dparts[0]
    dq = dparts[1]
    di = dparts[2]
    if order >= 2:
        du += dparts[3] * q + dparts[5] * i
        dq += dparts[3] * u + dparts[4] * i
        di += dparts[4] * q + dparts[5] * u
    if order >= 3:
        du += dparts[6] * (q * i)
        dq += dparts[6] * (u * i)
        di += dparts[6] * (u * q)
    du_ref[...] = du.astype(du_ref.dtype)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    # di is wrt i_σ; emit wrt i_t1 (σ → t1 is the ρ-gather)
    di_ref[...] = _dg_apply_rows(di.astype(di_ref.dtype), rho_ref, off,
                                 cols)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]


def _bwd_kernel(u_ref, q_ref, i_ref, w_ref, c_ref, du_ref, dq_ref, di_ref,
                dw_ref, db_ref, dw_acc, db_acc, *, order):
    t = pl.program_id(0)
    u, q, i = u_ref[...], q_ref[...], i_ref[...]
    cot = c_ref[...]                                    # [out, BLK]
    cot_b = cot.astype(jnp.bfloat16)
    d = u.shape[0]
    parts = _parts(u, q, i, order)
    if u.dtype == jnp.bfloat16:
        # product-rule factors below multiply f32 dparts elementwise;
        # promote once so the VPU math runs f32
        u, q, i = (a.astype(jnp.float32) for a in (u, q, i))

    @pl.when(t == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    # dpart_j = W_j · cot ; dW_j += part_j · cotᵀ
    dparts = []
    for j, p in enumerate(parts):
        kj = w_ref[j * d:(j + 1) * d, :].astype(jnp.bfloat16)
        dparts.append(jax.lax.dot_general(
            kj, cot_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))        # [d, BLK]
        dw_acc[j * d:(j + 1) * d, :] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), cot_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [d, out]
    db_acc[...] += jnp.sum(cot.astype(jnp.float32), axis=1, keepdims=True)

    du = dparts[0]
    dq = dparts[1]
    di = dparts[2]
    if order >= 2:
        du += dparts[3] * q + dparts[5] * i
        dq += dparts[3] * u + dparts[4] * i
        di += dparts[4] * q + dparts[5] * u
    if order >= 3:
        du += dparts[6] * (q * i)
        dq += dparts[6] * (u * i)
        di += dparts[6] * (u * q)
    du_ref[...] = du.astype(du_ref.dtype)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    di_ref[...] = di.astype(di_ref.dtype)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]


def _role_spec(d):
    return pl.BlockSpec((d, BLK), lambda t: (0, t), memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _batchk() -> bool:
    import os
    return os.environ.get("IHGNN_INTERACT_BATCHK", "1") == "1"


@functools.partial(jax.jit, static_argnames=("order", "interpret"))
def interact_fwd(u_t, q_t, i_t, w, b2, order: int, interpret: bool = False):
    """u/q/i: [d, E] (E % BLK == 0); w: [parts*d, out]; b2: [out, 1]
    → [out, E]."""
    d, e = u_t.shape
    out_dim = w.shape[1]
    assert e % BLK == 0, e
    assert w.shape[0] == ORDER_PARTS[order] * d, (w.shape, order, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_batchk if _batchk() else _fwd_kernel,
                          order=order),
        grid=(e // BLK,),
        in_specs=[_role_spec(d), _role_spec(d), _role_spec(d),
                  _full_spec(), _full_spec()],
        out_specs=pl.BlockSpec((out_dim, BLK), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, e), u_t.dtype),
        interpret=interpret,
    )(u_t, q_t, i_t, w, b2)


@functools.partial(jax.jit, static_argnames=("order", "interpret"))
def interact_bwd(u_t, q_t, i_t, w, cot, order: int, interpret: bool = False):
    """Returns (du, dq, di, dw, db2) for ``interact_fwd``."""
    d, e = u_t.shape
    out_dim = w.shape[1]
    n_parts = ORDER_PARTS[order]
    return pl.pallas_call(
        functools.partial(_bwd_kernel_batchk if _batchk() else _bwd_kernel,
                          order=order),
        grid=(e // BLK,),
        in_specs=[_role_spec(d), _role_spec(d), _role_spec(d),
                  _full_spec(),
                  pl.BlockSpec((out_dim, BLK), lambda t: (0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            _role_spec(d), _role_spec(d), _role_spec(d),
            pl.BlockSpec((n_parts * d, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((n_parts * d, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((out_dim, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_parts * d, out_dim), jnp.float32),
            pltpu.VMEM((out_dim, 1), jnp.float32),
        ],
        interpret=interpret,
    )(u_t, q_t, i_t, w, cot)


def _tab_spec(cols):
    """dg word tables ride in 8-row blocks (int32 sublane tiling rejects
    blocks of BLK/cols < 8 rows); programs sharing a block select their
    rows via _tab_off."""
    rpb = BLK // cols
    rows_blk = max(rpb, 8)
    per8 = rows_blk // rpb
    return pl.BlockSpec((rows_blk, cols), lambda t: (t // per8, 0),
                        memory_space=pltpu.VMEM)


def absorb_blk_ok(e_pad: int, rows: int, cols: int, d: int, dtype) -> bool:
    """Shape gate for the absorbed interaction: the dg word rows must
    nest inside interaction blocks and satisfy the dg kernel's limits."""
    rpb = BLK // cols if cols and BLK % cols == 0 else 0
    return (rpb > 0 and e_pad % BLK == 0
            and rows % max(rpb, 8) == 0
            and cols % 128 == 0 and cols // 128 <= 16
            and (dtype != jnp.bfloat16 or d % 2 == 0))


@functools.partial(jax.jit, static_argnames=("order", "cols", "interpret"))
def interact_fwd_absorb(u_t, q_t, i_t1, pi, rho, w, b2, order: int,
                        cols: int, interpret: bool = False):
    """Absorbed forward: i arrives pre-p2 ("t1") ordered; returns
    (o1 [out, E] σ-ordered edge features, o2 = ρ-permuted o1 — the
    scatter i-chain's first-stage output)."""
    d, e = u_t.shape
    out_dim = w.shape[1]
    assert e % BLK == 0 and BLK % cols == 0, (e, cols)
    o_spec = pl.BlockSpec((out_dim, BLK), lambda t: (0, t),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_absorb, order=order, cols=cols),
        grid=(e // BLK,),
        in_specs=[_role_spec(d), _role_spec(d), _role_spec(d),
                  _tab_spec(cols), _tab_spec(cols),
                  _full_spec(), _full_spec()],
        out_specs=[o_spec, o_spec],
        out_shape=[jax.ShapeDtypeStruct((out_dim, e), u_t.dtype),
                   jax.ShapeDtypeStruct((out_dim, e), u_t.dtype)],
        interpret=interpret,
    )(u_t, q_t, i_t1, pi, rho, w, b2)


@functools.partial(jax.jit,
                   static_argnames=("order", "cols", "interpret"))
def interact_bwd_absorb(u_t, q_t, i_t1, pi, rho, w, c1, c2, mask,
                        order: int, cols: int, interpret: bool = False):
    """Returns (du, dq, di_t1, dw, db2) for ``interact_fwd_absorb``.
    ``mask`` is the σ-pad validity row ([1, E] f32) or None."""
    d, e = u_t.shape
    out_dim = w.shape[1]
    n_parts = ORDER_PARTS[order]
    masked = mask is not None
    cot_spec = pl.BlockSpec((out_dim, BLK), lambda t: (0, t),
                            memory_space=pltpu.VMEM)
    in_specs = [_role_spec(d), _role_spec(d), _role_spec(d),
                _tab_spec(cols), _tab_spec(cols), _full_spec(),
                cot_spec, cot_spec]
    args = [u_t, q_t, i_t1, pi, rho, w, c1, c2]
    if masked:
        in_specs.append(pl.BlockSpec((1, BLK), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(_bwd_kernel_absorb, order=order, cols=cols,
                               masked=masked)
    if not masked:
        def kernel(u, q, i, pi_r, rho_r, w_r, c1_r, c2_r, *outs,
                   order=order, cols=cols):
            return _bwd_kernel_absorb(u, q, i, pi_r, rho_r, w_r, c1_r,
                                      c2_r, None, *outs, order=order,
                                      cols=cols, masked=False)
    return pl.pallas_call(
        kernel,
        grid=(e // BLK,),
        in_specs=in_specs,
        out_specs=[
            _role_spec(d), _role_spec(d), _role_spec(d),
            pl.BlockSpec((n_parts * d, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((d, e), u_t.dtype),
            jax.ShapeDtypeStruct((n_parts * d, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((out_dim, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_parts * d, out_dim), jnp.float32),
            pltpu.VMEM((out_dim, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Sharded dispatch: the fused kernel runs per-shard under shard_map (a
# naked pallas_call must not see GSPMD-sharded operands). The custom VJP
# sits OUTSIDE the shard_map (hyperagg.py's structure); parameter grads
# psum over the data axis. On non-TPU meshes the body runs the same math
# as plain jnp (the Mosaic interpreter deadlocks under multi-device
# shard_map on CPU — see hyperagg.py).
# ---------------------------------------------------------------------------


def _pad_blk(x):
    e = x.shape[1]
    e_pad = -(-e // BLK) * BLK
    return (jnp.pad(x, ((0, 0), (0, e_pad - e))) if e_pad != e else x), e


def _body_fwd(u, q, i, w, b2, order, on_tpu):
    (up, e), (qp, _), (ip, _) = _pad_blk(u), _pad_blk(q), _pad_blk(i)
    if on_tpu:
        return interact_fwd(up, qp, ip, w, b2, order)[:, :e]
    d = u.shape[0]
    acc = b2.astype(jnp.float32)
    for j, p in enumerate(_parts(u, q, i, order)):
        kj = w[j * d:(j + 1) * d, :].astype(p.dtype)
        acc = acc + jax.lax.dot_general(
            kj, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.astype(u.dtype)


def _mesh_specs(mesh):
    from jax.sharding import PartitionSpec as P

    from ihgnn_tpu.parallel.mesh import DATA_AXIS
    plat = mesh.devices.flat[0].platform
    return P, DATA_AXIS, plat


def _fis_impl(u_t, q_t, i_t, w, b2, order, mesh):
    P, data, plat = _mesh_specs(mesh)

    def body(u, q, i, w, b2):
        return _body_fwd(u, q, i, w, b2, order, plat == "tpu")

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(P(None, data),) * 3 + (P(), P()),
                         out_specs=P(None, data),
                         check_vma=False)(u_t, q_t, i_t, w, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_interaction_sharded(u_t, q_t, i_t, w, b2, order: int, mesh):
    return _fis_impl(u_t, q_t, i_t, w, b2, order, mesh)


def _fis_fwd(u_t, q_t, i_t, w, b2, order, mesh):
    return _fis_impl(u_t, q_t, i_t, w, b2, order, mesh), (u_t, q_t, i_t, w)


def _fis_bwd(order, mesh, res, cot):
    u_t, q_t, i_t, w = res
    P, data, plat = _mesh_specs(mesh)

    def body(u, q, i, w, cot):
        if plat == "tpu":
            (up, e), (qp, _), (ip, _) = _pad_blk(u), _pad_blk(q), _pad_blk(i)
            cp, _ = _pad_blk(cot)
            du, dq, di, dw, db = interact_bwd(up, qp, ip, w, cp, order)
            du, dq, di = du[:, :e], dq[:, :e], di[:, :e]
        else:
            def f(u, q, i, w):
                out = _body_fwd(u, q, i, w,
                                jnp.zeros((cot.shape[0], 1), jnp.float32),
                                order, False)
                return jnp.sum(out.astype(jnp.float32)
                               * cot.astype(jnp.float32))
            du, dq, di, dw = jax.grad(f, argnums=(0, 1, 2, 3))(u, q, i, w)
            db = jnp.sum(cot.astype(jnp.float32), axis=1, keepdims=True)
        return (du, dq, di, jax.lax.psum(dw, data), jax.lax.psum(db, data))

    du, dq, di, dw, db = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, data), P(None, data), P(None, data), P(),
                  P(None, data)),
        out_specs=((P(None, data),) * 3 + (P(), P())),
        check_vma=False)(u_t, q_t, i_t, w, cot)
    return du, dq, di, dw.astype(w.dtype), db


fused_interaction_sharded.defvjp(_fis_fwd, _fis_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_interaction(u_t, q_t, i_t, w, b2, order: int):
    return interact_fwd(u_t, q_t, i_t, w, b2, order)


def _fi_fwd(u_t, q_t, i_t, w, b2, order):
    return interact_fwd(u_t, q_t, i_t, w, b2, order), (u_t, q_t, i_t, w)


def _fi_bwd(order, res, cot):
    u_t, q_t, i_t, w = res
    du, dq, di, dw, db2 = interact_bwd(u_t, q_t, i_t, w, cot, order)
    return du, dq, di, dw, db2


fused_interaction.defvjp(_fi_fwd, _fi_bwd)


def _f0(a):
    """float0 cotangent for an integer/auxiliary operand (hyperagg.py
    pattern: index arrays ride custom-vjp signatures as explicit args)."""
    import numpy as _np
    return _np.zeros(a.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_interaction_absorb(u_t, q_t, i_t1, w, b2, pi, rho, mask,
                             order: int, cols: int):
    """Absorbed fused interaction (see _fwd_kernel_absorb): i_t1 is the
    i role in pre-p2 order; returns (o1 σ-ordered edge features,
    o2 = ρ(o1)). pi/rho: packed dg word tables [R, C] (StageTable.tab of
    kp.i.fwd_p2 / kp.i.inv_p2); mask: kp.sig_mask or None."""
    return interact_fwd_absorb(u_t, q_t, i_t1, pi, rho, w, b2, order, cols)


def _fia_fwd(u_t, q_t, i_t1, w, b2, pi, rho, mask, order, cols):
    out = interact_fwd_absorb(u_t, q_t, i_t1, pi, rho, w, b2, order, cols)
    return out, (u_t, q_t, i_t1, w, pi, rho, mask)


def _fia_bwd(order, cols, res, cot):
    u_t, q_t, i_t1, w, pi, rho, mask = res
    c1, c2 = cot
    du, dq, di_t1, dw, db2 = interact_bwd_absorb(
        u_t, q_t, i_t1, pi, rho, w, c1.astype(u_t.dtype),
        c2.astype(u_t.dtype), mask, order, cols)
    return (du, dq, di_t1, dw, db2, _f0(pi), _f0(rho),
            None if mask is None else jnp.zeros_like(mask))


fused_interaction_absorb.defvjp(_fia_fwd, _fia_bwd)
