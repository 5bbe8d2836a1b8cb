"""Fused Pallas interaction kernel vs the split-matmul fallback
(interpreter mode on CPU — same code the TPU compiles, minus Mosaic).

The fused kernel rounds MXU operands to bf16 (the TPU default-precision
contract, CLAUDE.md). The forward test emulates that rounding in the
reference so the comparison is tight; grad tests use a scale-aware bound
(bf16 rounding error accumulates with the reduction length).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.models.interaction import FeatureInteractor
from ihgnn_tpu.ops.pallas.interact import BLK, ORDER_PARTS, interact_bwd, interact_fwd

D = 8
OUT = 8
E = 2 * BLK  # two grid programs: covers the dW/db accumulation logic


def _close(got, ref, tol):
    """|got - ref| ≤ tol · max|ref| elementwise (bf16-rounding bound)."""
    got, ref = np.asarray(got), np.asarray(ref)
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(got, ref, rtol=0, atol=tol * scale)


def _roles(e=E, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((D, e)).astype(np.float32))
                 for _ in range(3))


def _np_parts(u, q, i, order):
    parts = [u, q, i]
    if order >= 2:
        parts += [u * q, q * i, i * u]
    if order >= 3:
        parts.append(u * q * i)
    return parts


def _bf16(x):
    return np.asarray(x).astype(jnp.bfloat16).astype(np.float32)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fwd_matches_bf16_reference(order):
    u, q, i = _roles()
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal(
        (ORDER_PARTS[order] * D, OUT)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((OUT, 1)).astype(np.float32))
    out = np.asarray(interact_fwd(u, q, i, w, b2, order, interpret=True))
    # reference with the kernel's exact precision contract: parts are
    # computed in f32, operands rounded to bf16 at each matmul
    ref = np.asarray(b2) + sum(
        _bf16(np.asarray(w)[j * D:(j + 1) * D]).T @ _bf16(p)
        for j, p in enumerate(_np_parts(*map(np.asarray, (u, q, i)), order)))
    _close(out, ref, 1e-4)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_bwd_matches_autodiff(order):
    """Kernel backward vs jax.grad through the pure-jnp f32 formula —
    bounded by bf16 rounding accumulated over the E reduction."""
    u, q, i = _roles(seed=2)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(
        (ORDER_PARTS[order] * D, OUT)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((OUT, 1)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((OUT, E)).astype(np.float32))

    du, dq, di, dw, db = interact_bwd(u, q, i, w, cot, order, interpret=True)

    def loss(u, q, i, w, b2):
        out = b2 + sum(
            jax.lax.dot_general(w[j * D:(j + 1) * D], p,
                                (((0,), (0,)), ((), ())))
            for j, p in enumerate(_np_parts(u, q, i, order)))
        return jnp.sum(out * cot)

    refs = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(u, q, i, w, b2)
    for got, ref in zip((du, dq, di, dw, db), refs):
        _close(got, ref, 3e-2)


def test_module_paths_share_params_and_agree():
    """FeatureInteractor fused path == fallback path: identical param
    trees (checkpoint compatible) and matching outputs/grads."""
    order = 3
    roles = _roles(seed=4)
    mod = FeatureInteractor(order, D, OUT)
    params = mod.init(jax.random.key(0), roles, fused_ok=False)
    with pltpu.force_tpu_interpret_mode():
        params_fused = mod.init(jax.random.key(0), roles, fused_ok=True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cot = jnp.asarray(np.random.default_rng(5).standard_normal(
        (OUT, E)).astype(np.float32))

    def loss(params, fused):
        return jnp.sum(mod.apply(params, roles, fused_ok=fused) * cot)

    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    with pltpu.force_tpu_interpret_mode():
        l_fused, g_fused = jax.value_and_grad(loss)(params, True)
    assert float(l_fused) == pytest.approx(float(l_ref), rel=2e-2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        _close(b, a, 3e-2)


def test_absorb_kernels_cols1024_table_sharing():
    """The absorbed kernels at cols=1024 (bench shape): BLK/cols = 2
    programs share each 8-row table block, exercising the _tab_off
    row-select path. fwd: o1 == interact(u, q, π(i_t1)), o2 == ρ(o1);
    bwd: grads match autodiff through the explicit-permute formulation."""
    from ihgnn_tpu.ops.benes import route_rows_hier
    from ihgnn_tpu.ops.pallas.interact import (fused_interaction,
                                               fused_interaction_absorb)

    cols, rows, order = 1024, 16, 3
    e = rows * cols
    rng = np.random.default_rng(11)
    perm = np.stack([rng.permutation(cols) for _ in range(rows)])
    inv = np.argsort(perm, axis=1)
    pi = jnp.asarray(route_rows_hier(perm, w=128))
    rho = jnp.asarray(route_rows_hier(inv, w=128))
    u, q, i_t1 = _roles(e=e, seed=12)
    w = jnp.asarray(rng.standard_normal((7 * D, OUT)).astype(np.float32)
                    * 0.1)
    b2 = jnp.asarray(rng.standard_normal((OUT, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, e)) > 0.1).astype(np.float32))

    def apply_perm(x, p):      # out[:, r, c] = x[:, r, p[r, c]]
        g = x.reshape(-1, rows, cols)
        pj = jnp.broadcast_to(jnp.asarray(p)[None], g.shape)
        return jnp.take_along_axis(g, pj, axis=2).reshape(-1, e)

    def loss_ref(u, i_t1, w):
        o1 = fused_interaction(u, q, apply_perm(i_t1, perm), w, b2, order)
        o2 = apply_perm(o1, inv)
        return (jnp.sum(o1 * o1 * mask) + jnp.sum(o2[:, ::2] * o2[:, ::2]
                                                  * mask[:, ::2]))

    def loss_abs(u, i_t1, w):
        o1, o2 = fused_interaction_absorb(u, q, i_t1, w, b2, pi, rho,
                                          None, order, cols)
        return (jnp.sum(o1 * o1 * mask) + jnp.sum(o2[:, ::2] * o2[:, ::2]
                                                  * mask[:, ::2]))

    with pltpu.force_tpu_interpret_mode():
        lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(u, i_t1, w)
        la, ga = jax.value_and_grad(loss_abs, argnums=(0, 1, 2))(u, i_t1, w)
    assert float(la) == pytest.approx(float(lr), rel=1e-3)
    for a, b in zip(ga, gr):
        _close(a, b, 3e-2)
