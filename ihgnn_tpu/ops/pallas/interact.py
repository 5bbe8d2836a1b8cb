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

BLK = 2048           # edge columns per program

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


@functools.partial(jax.jit, static_argnames=("order", "interpret"))
def interact_fwd(u_t, q_t, i_t, w, b2, order: int, interpret: bool = False):
    """u/q/i: [d, E] (E % BLK == 0); w: [parts*d, out]; b2: [out, 1]
    → [out, E]."""
    d, e = u_t.shape
    out_dim = w.shape[1]
    assert e % BLK == 0, e
    assert w.shape[0] == ORDER_PARTS[order] * d, (w.shape, order, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, order=order),
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
        functools.partial(_bwd_kernel, order=order),
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
