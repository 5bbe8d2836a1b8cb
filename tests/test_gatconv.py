"""Routed feature-major GAT conv (ops/gatconv.py) vs the row-major
`_GatCore` reference path — values and gradients, both heads.

Runs on CPU: the routed impl dispatches its jnp reference twins
(hyperagg._kernels_active() False), which covers the pack construction,
the expansion/permute/segment plumbing, and the hand-written VJP; Mosaic
kernel-level parity is covered by the interpret-mode kernel tests and
tools/kernel_check.py on chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihgnn_tpu.config import V
from ihgnn_tpu.graph import build_graph2d
from ihgnn_tpu.models.layers import GATLayer
from ihgnn_tpu.ops.gatconv import build_gat_pack, gat_conv_t

D = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    U, Q, I, P = 40, 25, 60, 700
    n = U + Q + I
    uqif = np.stack([rng.integers(0, U, P), rng.integers(0, Q, P),
                     rng.integers(0, I, P), np.ones(P, np.int64)], axis=1)
    graph = build_graph2d(uqif, n, U, Q, completeness=V.GRAPH_UQI)
    assert graph.gat_pk is not None, "small graph should pack"
    x_t = jnp.asarray(rng.standard_normal((D, n)).astype(np.float32))
    return graph, x_t


@pytest.mark.parametrize("head", [V.CONCAT, V.PRODUCT])
def test_gat_conv_matches_gatcore(setup, head):
    graph, x_t = setup
    layer = GATLayer(D, D, head=head)
    params = layer.init(jax.random.key(0), x_t, graph)

    # reference: the row-major fallback path (the layer on CPU)
    ref = layer.apply(params, x_t, graph)

    # routed path, same params (identical trees by construction)
    tp = params["params"]["feature_transform"]["dense"]
    xt = (jnp.einsum("io,in->on", tp["kernel"], x_t)
          + tp["bias"][:, None])
    hp = params["params"]["gat"]["feature_aggregate"]
    hname = "concat" if head == V.CONCAT else "product"
    out = gat_conv_t(xt, hp["kernel"], hp["bias"], graph.gat_pk, hname)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("head", [V.CONCAT, V.PRODUCT])
def test_gat_conv_grads_match(setup, head):
    graph, x_t = setup
    layer = GATLayer(D, D, head=head)
    params = layer.init(jax.random.key(1), x_t, graph)
    hp = params["params"]["gat"]["feature_aggregate"]
    hname = "concat" if head == V.CONCAT else "product"
    pk = graph.gat_pk

    def loss_routed(x, k, b):
        out = gat_conv_t(x, k, b, pk, hname)
        return jnp.sum(jnp.sin(out))

    def loss_ref(x, k, b):
        # re-implement _GatCore math directly (jnp, row-major)
        from ihgnn_tpu.models.common import LEAKY_SLOPE
        src = np.asarray(graph.row)[np.asarray(graph.dst_order)]
        dst = np.asarray(graph.col)[np.asarray(graph.dst_order)]
        xr = x.T                                         # [n, d]
        xs, xd = xr[src], xr[dst]
        pair = (jnp.concatenate([xs, xd], axis=1) if hname == "concat"
                else xs * xd)
        s = jax.nn.leaky_relu(pair @ k + b, LEAKY_SLOPE)[:, 0]
        mask = np.asarray(graph.val)[np.asarray(graph.dst_order)] > 0
        s = jnp.where(mask, s, -1e30)
        m = jax.ops.segment_max(s, dst, num_segments=graph.node_count)
        w = jnp.exp(s - m[dst])
        den = jax.ops.segment_sum(w, dst, num_segments=graph.node_count)
        a = w / den[dst] * mask
        out = jax.ops.segment_sum(xs * a[:, None], dst,
                                  num_segments=graph.node_count)
        return jnp.sum(jnp.sin(out.T))

    xk = x_t
    g1 = jax.grad(loss_routed, argnums=(0, 1, 2))(xk, hp["kernel"],
                                                  hp["bias"])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(xk, hp["kernel"],
                                               hp["bias"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_gat_conv_chunked_matches_single():
    """ChunkedGatPack (tiny chunk cap) == single-pack values+grads."""
    from ihgnn_tpu.ops.gatconv import ChunkedGatPack, build_gat_pack

    rng = np.random.default_rng(7)
    n, e = 600, 9000
    src = rng.integers(0, n, e)
    dst = np.sort(rng.integers(0, n, e))
    x = jnp.asarray(rng.standard_normal((D, n)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2 * D, 1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    pk1 = build_gat_pack(src, dst, n)
    pk2 = build_gat_pack(src, dst, n, cols=128, chunk_rows_cap=16)
    assert isinstance(pk2, ChunkedGatPack)

    def loss(pk):
        return lambda x, k, b: jnp.sum(
            jnp.sin(gat_conv_t(x, k, b, pk, "concat")))

    l1, g1 = jax.value_and_grad(loss(pk1))(x, k, b)
    l2, g2 = jax.value_and_grad(loss(pk2))(x, k, b)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-5)
