"""Pallas hyperedge-op pipeline vs the XLA reference path (interpreter
mode on CPU — same code the TPU compiles, minus Mosaic).

Round 3: the single-chip pack runs in σ order (the q-role's pre-final-
stage state, a row-local scramble of edge order — ops/packing.py). Tests
recover the σ↔edge relabeling from the pack's ``sig_stage`` to compare
against direct edge-order references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.ops.hyperagg import (_gather_roles_pallas, _scatter_pallas,
                                    make_hyper_ops, sigma_to_edge_order)

D = 8


@pytest.fixture(scope="module")
def graph():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=60, seed=3)
    return data.hypergraph


def _pad(x, width):
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


def _edge_pos(kp):
    """[e_pad] σ position of each (padded-grid) edge id: edge (r, c) lives
    at σ position (r, p2q[r, c])."""
    if not kp.sigma:
        return np.arange(kp.e_pad)
    from ihgnn_tpu.ops.pallas.permute import unpack_stage_perm
    p2q = np.asarray(unpack_stage_perm(kp.sig_stage))        # [R, C]
    base = np.arange(kp.rows)[:, None] * kp.cols
    return (base + p2q).reshape(-1)


def test_pack_is_sigma(graph):
    assert graph.kp is not None and graph.kp.sigma
    assert graph.kp.q.fwd_p2 is None and graph.kp.q.inv_p2 is None
    assert graph.kp.i.fwd_p2 is not None and graph.kp.i.inv_p2 is not None


def test_gather_matches_direct(graph):
    kp = graph.kp
    rng = np.random.default_rng(0)
    x = rng.standard_normal((D, graph.node_count)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_gather_roles_pallas(_pad(jnp.asarray(x),
                                                   kp.src_pad), kp))
    pos = _edge_pos(kp)[:kp.e]
    for r in range(3):
        np.testing.assert_allclose(out[r][:, pos], x[:, graph.i3[:, r]],
                                   rtol=1e-4, atol=1e-4)


def test_scatter_matches_direct(graph):
    kp = graph.kp
    rng = np.random.default_rng(1)
    ef = rng.standard_normal((D, kp.e_pad)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_scatter_pallas(jnp.asarray(ef), kp))
    # reference: re-label the σ-ordered stream into edge order first
    pos = _edge_pos(kp)[:kp.e]
    ef_edge = ef[:, pos]
    ref = np.zeros((D, graph.node_count), np.float32)
    np.add.at(ref.T, np.asarray(graph.inc_node),
              ef_edge[:, np.asarray(graph.inc_edge)].T)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sigma_to_edge_order(graph):
    kp = graph.kp
    rng = np.random.default_rng(4)
    ef = rng.standard_normal((D, kp.e_pad)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sigma_to_edge_order(jnp.asarray(ef), kp))
    pos = _edge_pos(kp)
    # f32 rides the hier kernel's bf16 hi/lo split (~1e-4; bf16 is exact)
    np.testing.assert_allclose(out, ef[:, pos], rtol=1e-4, atol=1e-4)


def test_pallas_grads_match_xla_path(graph):
    """d(loss)/dx and d(loss)/d(edge features) through the Pallas custom
    VJPs equal autodiff through the XLA fallback ops."""
    kp = graph.kp
    rng = np.random.default_rng(2)
    e, e_pad = kp.e, kp.e_pad
    pos = jnp.asarray(_edge_pos(kp)[:e])
    x = jnp.asarray(rng.standard_normal((D, graph.node_count)).astype(np.float32))
    ef_edge = jnp.asarray(rng.standard_normal((D, e)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((D, 3 * e)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((D, graph.node_count)).astype(np.float32))

    # σ-ordered edge-feature input built from the edge-order primal
    def to_sigma(ef):
        out = jnp.zeros((D, e_pad), ef.dtype)
        return out.at[:, pos].set(ef)

    def loss_pallas(x, ef):
        g = _gather_roles_pallas(_pad(x, kp.src_pad), kp)
        real = jnp.concatenate([g[r][:, pos] for r in range(3)], axis=1)
        return (jnp.sum(real * w3)
                + jnp.sum(_scatter_pallas(to_sigma(ef), kp) * wn))

    gather_x, scatter_x = make_hyper_ops(graph.replace(kp=None))

    def loss_xla(x, ef):
        g = gather_x(x)
        real = jnp.concatenate([g[0], g[1], g[2]], axis=1)
        return jnp.sum(real * w3) + jnp.sum(scatter_x(ef) * wn)

    with pltpu.force_tpu_interpret_mode():
        lp, (gx_p, ge_p) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(
            x, ef_edge)
    lx, (gx_x, ge_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, ef_edge)

    assert float(lp) == pytest.approx(float(lx), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_x),
                               rtol=1e-3, atol=1e-3)


def test_absorbed_pipeline_matches_unabsorbed(graph):
    """Round 4: the i-role final-stage absorption (gather-pre →
    fused_interaction_absorb → scatter2) must equal the unabsorbed
    pipeline in values AND grads (x and interaction weights)."""
    from ihgnn_tpu.ops.hyperagg import (_gather_pre_pallas, _scatter2_pallas,
                                        absorb_i_ok)
    from ihgnn_tpu.ops.pallas.interact import (fused_interaction,
                                               fused_interaction_absorb)

    kp = graph.kp
    assert absorb_i_ok(kp, D, jnp.float32), (kp.cols, kp.rows, kp.e_pad)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((D, graph.node_count))
                    .astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7 * D, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((D, 1)).astype(np.float32))
    pi, rho = kp.i.fwd_p2.tab, kp.i.inv_p2.tab

    def loss_plain(x, w):
        u, q, i = _gather_roles_pallas(_pad(x, kp.src_pad), kp)
        o1 = fused_interaction(u, q, i, w, b2, 3)
        out = _scatter_pallas(o1, kp)
        return jnp.sum(out * out)

    def loss_absorb(x, w):
        u, q, i_t1 = _gather_pre_pallas(_pad(x, kp.src_pad), kp)
        o1, o2 = fused_interaction_absorb(u, q, i_t1, w, b2, pi, rho,
                                          kp.sig_mask, 3, kp.cols)
        out = _scatter2_pallas(o1, o2, kp)
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        lp, (gx_p, gw_p) = jax.value_and_grad(loss_plain,
                                              argnums=(0, 1))(x, w)
        la, (gx_a, gw_a) = jax.value_and_grad(loss_absorb,
                                              argnums=(0, 1))(x, w)
    assert float(la) == pytest.approx(float(lp), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_p),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# chunked packs (round 4): long grids split into dg-eligible chunks
# ---------------------------------------------------------------------------


def _make_chunked(E=33000, cap=128, cols=128, seed=9):
    from ihgnn_tpu.ops.packing import (ChunkedHyperPack,
                                       build_hyper_kernel_pack)
    U, Q, I = 50, 40, 60
    N = U + Q + I
    rng = np.random.default_rng(seed)
    u = np.sort(rng.integers(0, U, E))
    i3 = np.stack([u, U + rng.integers(0, Q, E),
                   U + Q + rng.integers(0, I, E)], axis=1).astype(np.int64)
    ckp = build_hyper_kernel_pack(i3, N, cols=cols, chunk_rows_cap=cap)
    assert isinstance(ckp, ChunkedHyperPack), type(ckp)
    return i3, N, ckp


def _edge_pos_chunked(ckp):
    """Concat-stream position of each (true) edge id, in edge order."""
    pos, off = [], 0
    for pk in ckp.packs:
        pos.append(_edge_pos(pk)[:pk.e] + off)
        off += pk.e_pad
    return np.concatenate(pos)


def test_chunked_pack_structure():
    i3, N, ckp = _make_chunked()
    assert len(ckp.packs) == 3
    assert ckp.e == i3.shape[0] and ckp.e_pad == sum(
        pk.e_pad for pk in ckp.packs)
    assert all(pk.rows <= 128 for pk in ckp.packs)
    assert all(pk.src_pad == ckp.src_pad for pk in ckp.packs)
    # last (partial) chunk carries the σ-pad mask
    assert ckp.packs[-1].e < ckp.packs[-1].e_pad
    assert ckp.packs[-1].sig_mask is not None


def test_chunked_gather_scatter_and_grads():
    """Chunked custom-VJP gather/scatter == direct XLA formulas, values
    and gradients (the stress-scale pack form, scaled down)."""
    i3, N, ckp = _make_chunked()
    E = i3.shape[0]
    rng = np.random.default_rng(3)
    pos = jnp.asarray(_edge_pos_chunked(ckp))
    x = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32))
    ef_edge = jnp.asarray(rng.standard_normal((D, E)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((D, 3 * E)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32))
    i3j = jnp.asarray(i3)

    def to_sigma(ef):
        out = jnp.zeros((D, ckp.e_pad), ef.dtype)
        return out.at[:, pos].set(ef)

    def loss_pallas(x, ef):
        g = _gather_roles_pallas(_pad(x, ckp.src_pad), ckp)
        real = jnp.concatenate([g[r][:, pos] for r in range(3)], axis=1)
        return (jnp.sum(real * w3)
                + jnp.sum(_scatter_pallas(to_sigma(ef), ckp) * wn))

    def loss_xla(x, ef):
        real = jnp.concatenate([x[:, i3j[:, r]] for r in range(3)], axis=1)
        out = jnp.zeros((D, N), jnp.float32)
        for r in range(3):
            out = out.at[:, i3j[:, r]].add(ef)
        return jnp.sum(real * w3) + jnp.sum(out * wn)

    with pltpu.force_tpu_interpret_mode():
        lp, (gx_p, ge_p) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(
            x, ef_edge)
    lx, (gx_x, ge_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(
        x, ef_edge)
    assert float(lp) == pytest.approx(float(lx), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_x),
                               rtol=1e-3, atol=1e-3)


def test_chunked_absorbed_matches_unabsorbed():
    """The i-role absorption with CONCATENATED per-chunk p2 tables
    (hyperagg.absorb_tables) == the plain chunked pipeline."""
    from ihgnn_tpu.ops.hyperagg import (_gather_pre_pallas, _scatter2_pallas,
                                        absorb_i_ok, absorb_tables)
    from ihgnn_tpu.ops.pallas.interact import (fused_interaction,
                                               fused_interaction_absorb)

    i3, N, ckp = _make_chunked(E=20000)
    assert absorb_i_ok(ckp, D, jnp.float32)
    pi, rho, mask, cols = absorb_tables(ckp)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7 * D, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((D, 1)).astype(np.float32))

    def loss_plain(x, w):
        u, q, i = _gather_roles_pallas(_pad(x, ckp.src_pad), ckp)
        o1 = fused_interaction(u, q, i, w, b2, 3)
        out = _scatter_pallas(o1, ckp)
        return jnp.sum(out * out)

    def loss_absorb(x, w):
        u, q, i_t1 = _gather_pre_pallas(_pad(x, ckp.src_pad), ckp)
        o1, o2 = fused_interaction_absorb(u, q, i_t1, w, b2, pi, rho,
                                          mask, 3, cols)
        out = _scatter2_pallas(o1, o2, ckp)
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        lp, (gx_p, gw_p) = jax.value_and_grad(loss_plain,
                                              argnums=(0, 1))(x, w)
        la, (gx_a, gw_a) = jax.value_and_grad(loss_absorb,
                                              argnums=(0, 1))(x, w)
    assert float(la) == pytest.approx(float(lp), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_p),
                               rtol=1e-3, atol=1e-3)
