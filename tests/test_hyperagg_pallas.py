"""Pallas hyperedge-op pipeline vs the XLA reference path (interpreter
mode on CPU — same code the TPU compiles, minus Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.ops.hyperagg import (_gather_roles_pallas, _scatter_pallas,
                                    make_hyper_ops)

D = 8


@pytest.fixture(scope="module")
def graph():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=60, seed=3)
    return data.hypergraph


def _pad(x, width):
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


def test_gather_matches_direct(graph):
    kp = graph.kp
    rng = np.random.default_rng(0)
    x = rng.standard_normal((D, graph.node_count)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_gather_roles_pallas(_pad(jnp.asarray(x),
                                                   kp.src_pad), kp))
    e = kp.e
    for r in range(3):
        np.testing.assert_allclose(out[r][:, :e], x[:, graph.i3[:, r]],
                                   rtol=1e-4, atol=1e-4)


def test_scatter_matches_direct(graph):
    kp = graph.kp
    rng = np.random.default_rng(1)
    ef = rng.standard_normal((D, kp.e_pad)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(_scatter_pallas(jnp.asarray(ef), kp))
    ref = np.zeros((D, graph.node_count), np.float32)
    np.add.at(ref.T, np.asarray(graph.inc_node),
              ef[:, :kp.e][:, np.asarray(graph.inc_edge)].T)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_grads_match_xla_path(graph):
    """d(loss)/dx and d(loss)/d(edge features) through the Pallas custom
    VJPs equal autodiff through the XLA fallback ops."""
    kp = graph.kp
    rng = np.random.default_rng(2)
    e, e_pad = kp.e, kp.e_pad
    x = jnp.asarray(rng.standard_normal((D, graph.node_count)).astype(np.float32))
    ef_pad = jnp.asarray(rng.standard_normal((D, e_pad)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((D, 3 * e)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((D, graph.node_count)).astype(np.float32))

    def loss_pallas(x, ef_pad):
        g = _gather_roles_pallas(_pad(x, kp.src_pad), kp)
        real = jnp.concatenate([g[r][:, :e] for r in range(3)], axis=1)
        return (jnp.sum(real * w3)
                + jnp.sum(_scatter_pallas(ef_pad, kp) * wn))

    gather_x, scatter_x = make_hyper_ops(graph.replace(kp=None))

    def loss_xla(x, ef_pad):
        g = gather_x(x)
        real = jnp.concatenate([g[0], g[1], g[2]], axis=1)
        return (jnp.sum(real * w3)
                + jnp.sum(scatter_x(ef_pad[:, :e]) * wn))

    with pltpu.force_tpu_interpret_mode():
        lp, (gx_p, ge_p) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(
            x, ef_pad)
    lx, (gx_x, ge_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, ef_pad)

    assert float(lp) == pytest.approx(float(lx), rel=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_x),
                               rtol=1e-3, atol=1e-3)
