"""bf16 conv-stream mode (ModelConfig.bf16_stream): numerics stay within
bf16 rounding of the f32 path, on both the XLA fallback and the Pallas
(interpreter-mode) pipelines, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.models.layers import IHGNNLayer
from ihgnn_tpu.ops.hyperagg import (_gather_roles_pallas, _scatter_pallas,
                                    make_hyper_ops)

D = 8


@pytest.fixture(scope="module")
def graph():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=60, seed=3)
    return data.hypergraph


def _close(got, ref, tol):
    got, ref = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(got, ref, rtol=0, atol=tol * scale)


def test_xla_ops_bf16_stream(graph):
    g32, s32 = make_hyper_ops(graph.replace(kp=None))
    g16, s16 = make_hyper_ops(graph.replace(kp=None), bf16_stream=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (D, graph.node_count)).astype(np.float32))
    ef = jnp.asarray(rng.standard_normal(
        (D, graph.edge_count)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal(
        (D, 3 * graph.edge_count)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal(
        (D, graph.node_count)).astype(np.float32))

    def loss(gather, scatter, x, ef):
        u, q, i = gather(x)
        cat = jnp.concatenate([jnp.asarray(u, jnp.float32),
                               jnp.asarray(q, jnp.float32),
                               jnp.asarray(i, jnp.float32)], axis=1)
        return jnp.sum(cat * w3) + jnp.sum(scatter(ef) * wn)

    l32, (gx32, ge32) = jax.value_and_grad(
        lambda x, ef: loss(g32, s32, x, ef), argnums=(0, 1))(x, ef)
    l16, (gx16, ge16) = jax.value_and_grad(
        lambda x, ef: loss(g16, s16, x, ef), argnums=(0, 1))(x, ef)

    assert float(l16) == pytest.approx(float(l32), rel=2e-2)
    _close(gx16, gx32, 2e-2)
    _close(ge16, ge32, 2e-2)


def test_pallas_prims_bf16_interpret(graph):
    """bf16 streams through the actual kernels (Mosaic interpreter):
    gather/scatter forward values and gradients match the f32 kernels
    within bf16 rounding."""
    kp = graph.kp
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(
        (D, graph.node_count)).astype(np.float32))
    x_pad = jnp.pad(x, ((0, 0), (0, kp.src_pad - graph.node_count)))
    ef = jnp.asarray(rng.standard_normal((D, kp.e_pad)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal(
        (D, 3 * kp.e_pad)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal(
        (D, graph.node_count)).astype(np.float32))

    def loss(x_pad, ef):
        u, q, i = _gather_roles_pallas(x_pad, kp)
        cat = jnp.concatenate([jnp.asarray(u, jnp.float32),
                               jnp.asarray(q, jnp.float32),
                               jnp.asarray(i, jnp.float32)], axis=1)
        return jnp.sum(cat * w3) + jnp.sum(_scatter_pallas(ef, kp) * wn)

    with pltpu.force_tpu_interpret_mode():
        l32, (gx32, ge32) = jax.value_and_grad(loss, argnums=(0, 1))(
            x_pad, ef)
        l16, (gx16, ge16) = jax.value_and_grad(
            lambda x, ef: loss(x.astype(jnp.bfloat16),
                               ef.astype(jnp.bfloat16)),
            argnums=(0, 1))(x_pad, ef)

    assert float(l16) == pytest.approx(float(l32), rel=2e-2)
    _close(gx16, gx32, 2e-2)
    _close(ge16, ge32, 2e-2)


def test_layer_bf16_stream_matches_f32(graph):
    """Full IHGNNLayer (XLA fallback path) with bf16_stream on vs off:
    same params, outputs and param grads within bf16 rounding."""
    g = graph.replace(kp=None)
    rng = np.random.default_rng(2)
    x_t = jnp.asarray(rng.standard_normal(
        (D, g.node_count)).astype(np.float32))
    l32 = IHGNNLayer(D, D, interaction_order=3)
    l16 = IHGNNLayer(D, D, interaction_order=3, bf16_stream=True)
    params = l32.init(jax.random.key(0), x_t, g)

    def loss(mod, params):
        return jnp.sum(mod.apply(params, x_t, g) ** 2)

    v32, g32 = jax.value_and_grad(lambda p: loss(l32, p))(params)
    v16, g16 = jax.value_and_grad(lambda p: loss(l16, p))(params)
    assert float(v16) == pytest.approx(float(v32), rel=2e-2)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        _close(b, a, 3e-2)
