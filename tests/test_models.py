"""Model-layer numerics vs dense NumPy oracles of the reference math."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihgnn_tpu.config import ModelConfig, V
from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.models.layers import GATLayer, GCNLayer, HGCNLayer, IHGNNLayer
from ihgnn_tpu.models.rawgnn import RawGnn

D = 8


@pytest.fixture(scope="module")
def data():
    return make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)


def _x(data, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((data.node_count, D)).astype(np.float32)


def _dense_of(params, name="feature_transform"):
    p = params["params"][name]["dense"]
    return np.asarray(p["kernel"]), np.asarray(p["bias"])


def test_gcn_matches_dense(data):
    g = data.graph2d
    x = _x(data)
    layer = GCNLayer(D, D)
    params = layer.init(jax.random.key(0), x.T, g)
    out = np.asarray(layer.apply(params, x.T, g)).T

    w, b = _dense_of(params)
    a = np.zeros((g.node_count, g.node_count), np.float32)
    a[g.row, g.col] = g.val
    dinv = (g.dv ** -0.5)
    expect = dinv * (a @ (dinv * (x @ w + b)))   # in_dim >= out_dim: transform first
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


def test_hgcn_matches_dense(data):
    g = data.hypergraph
    x = _x(data)
    layer = HGCNLayer(D, D)
    params = layer.init(jax.random.key(0), x.T, g)
    out = np.asarray(layer.apply(params, x.T, g)).T

    w, b = _dense_of(params)
    h = np.zeros((g.node_count, g.edge_count), np.float32)
    for e, (u, q, i) in enumerate(np.asarray(g.i3)):
        h[u, e] = h[q, e] = h[i, e] = 1
    dinv = g.dv ** -0.5
    xt = dinv * (x @ w + b)
    edge = (h.T @ xt) / 3.0
    expect = dinv * (h @ edge)
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_ihgnn_matches_dense(data, order):
    g = data.hypergraph
    x = _x(data)
    layer = IHGNNLayer(D, D, interaction_order=order)
    params = layer.init(jax.random.key(1), x.T, g)
    out = np.asarray(layer.apply(params, x.T, g)).T

    w, b = _dense_of(params)
    wa, ba = _dense_of({"params": params["params"]["interactor"]}, "aggregation")
    xt = x @ w + b
    i3 = np.asarray(g.i3)
    u, q, i = xt[i3[:, 0]], xt[i3[:, 1]], xt[i3[:, 2]]
    if order == 1:
        feats = np.concatenate([u, q, i], 1)
    elif order == 2:
        feats = np.concatenate([u, q, i, u * q, q * i, i * u], 1)
    else:
        feats = np.concatenate([u, q, i, u * q, q * i, i * u, u * q * i], 1)
    edge = feats @ wa + ba
    h = np.zeros((g.node_count, g.edge_count), np.float32)
    for e, (uu, qq, ii) in enumerate(i3):
        h[uu, e] = h[qq, e] = h[ii, e] = 1
    expect = (h @ edge) / g.dv
    np.testing.assert_allclose(out, expect, rtol=3e-4, atol=3e-4)


def test_gat_matches_dense(data):
    g = data.graph2d
    x = _x(data)
    layer = GATLayer(D, D, head=V.CONCAT)
    params = layer.init(jax.random.key(2), x.T, g)
    out = np.asarray(layer.apply(params, x.T, g)).T

    w, b = _dense_of(params)
    ph = params["params"]["gat"]["feature_aggregate"]
    wa, ba = np.asarray(ph["kernel"]), np.asarray(ph["bias"])
    xt = x @ w + b
    src, dst = np.asarray(g.row), np.asarray(g.col)
    pair = np.concatenate([xt[src], xt[dst]], 1)
    s = pair @ wa + ba
    s = np.where(s > 0, s, 0.01 * s)[:, 0]
    expect = np.zeros_like(xt)
    for d_node in np.unique(dst):
        m = dst == d_node
        e = np.exp(s[m] - s[m].max())
        wgt = e / e.sum()
        expect[d_node] = (xt[src[m]] * wgt[:, None]).sum(0)
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


def test_ihgnn_phase2_runs(data):
    g = data.hypergraph
    x = _x(data)
    layer = IHGNNLayer(D, D, interaction_order=2, phase2_attention=True)
    params = layer.init(jax.random.key(3), x.T, g)
    out = layer.apply(params, x.T, g).T
    assert out.shape == (g.node_count, D)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("gnn", [V.GCN, V.GAT, V.HGCN, V.IHGNN])
def test_rawgnn_forward_all_layer_types(data, gnn):
    cfg = ModelConfig(gnn=gnn, embedding_size=D, gnn_layer_count=2)
    model = RawGnn(cfg=cfg, user_count=data.user_count,
                   query_count=data.query_count, item_count=data.item_count,
                   vocab_size=data.vocab_size)
    graph = data.graph2d if gnn in (V.GCN, V.GAT) else data.hypergraph
    users = jnp.array([0, 1], jnp.int32)
    queries = jnp.array([0, 2], jnp.int32)
    items = jnp.array([3, 4], jnp.int32)
    params = model.init(jax.random.key(0), graph, data.query_words,
                        data.query_word_counts, users, queries, items)
    scores = model.apply(params, graph, data.query_words,
                         data.query_word_counts, users, queries, items)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()

    feats = model.apply(params, graph, data.query_words, data.query_word_counts,
                        method=model.all_features)
    assert feats.shape == (D * 3, data.node_count)

    # score_all consistency with per-row scoring
    all_scores = model.apply(params, feats, users, queries,
                             method=model.score_all_items)
    assert all_scores.shape == (2, data.item_count)
    np.testing.assert_allclose(np.asarray(all_scores)[[0, 1], [3, 4]],
                               np.asarray(scores), rtol=1e-5, atol=1e-5)


def test_query_embedding_is_bag_mean(data):
    cfg = ModelConfig(embedding_size=D)
    model = RawGnn(cfg=cfg, user_count=data.user_count,
                   query_count=data.query_count, item_count=data.item_count,
                   vocab_size=data.vocab_size)
    g = data.hypergraph
    u = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), g, data.query_words,
                        data.query_word_counts, u, u, u)
    feats = model.apply(params, g, data.query_words, data.query_word_counts,
                        method=model.all_features)
    vocab = np.asarray(params["params"]["embeddings"]["vocab_table"]).T
    q0_words = data.query_words[0][data.query_words[0] > 0]
    expect = vocab[q0_words].mean(0)
    got = np.asarray(feats)[:D, data.query_start]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_x0_slice_pad_vjp_matches_gather():
    """all_features_t's slice/pad custom VJP == arange-gather autodiff."""
    import jax
    import jax.numpy as jnp
    from ihgnn_tpu.models.embedding import EmbeddingTables

    U, Q, I, V_, d = 7, 5, 9, 11, 4
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(1, V_ + 1, size=(Q, 3)).astype(np.int32))
    qc = jnp.full(Q, 3, jnp.int32)
    emb = EmbeddingTables(user_count=U, item_count=I, vocab_size=V_,
                          embedding_size=d)
    params = emb.init(jax.random.key(0), qw, qc, method=emb.all_features_t)
    w = jnp.asarray(rng.standard_normal((d, U + Q + I)).astype(np.float32))

    def loss_new(p):
        return jnp.sum(emb.apply(p, qw, qc, method=emb.all_features_t) * w)

    def loss_ref(p):
        x = emb.apply(p, qw, qc, method=emb.all_features)  # arange gathers
        return jnp.sum(x.T * w)

    ln, gn = jax.value_and_grad(loss_new)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    assert float(ln) == pytest.approx(float(lr), rel=1e-5)
    for k in gn["params"]:
        np.testing.assert_allclose(np.asarray(gn["params"][k]),
                                   np.asarray(gr["params"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_bag_mean_routed_bwd_matches_autodiff():
    """bag_mean_t (Clos + segment-sum backward) == plain autodiff of the
    gather/einsum bag mean, both values and vocab-table gradient."""
    import jax
    import jax.numpy as jnp
    from ihgnn_tpu.ops.bag import bag_mean_t, make_bag_pack

    rng = np.random.default_rng(3)
    Q, L, V_, d = 40, 3, 25, 4
    rows = V_ + 1 + 5                 # shard-padded table
    qw_np = rng.integers(0, V_ + 1, size=(Q, L)).astype(np.int32)
    qw_np[:, 0] = np.maximum(qw_np[:, 0], 1)       # at least one word
    qc_np = (qw_np > 0).sum(axis=1).astype(np.int32)
    pack = make_bag_pack(qw_np, qc_np, vocab_rows=V_ + 1)
    # feature-major [d, rows] table (models/embedding.py layout)
    table = jnp.asarray(rng.standard_normal((d, rows)).astype(np.float32))
    qw = jnp.asarray(qw_np)
    inv_c = 1.0 / jnp.maximum(jnp.asarray(qc_np), 1).astype(jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, Q)).astype(np.float32))

    def loss_routed(table):
        return jnp.sum(bag_mean_t(table, qw, inv_c, pack, rows) * w)

    def loss_ref(table):
        gathered = table.T[qw]
        mask = (qw > 0).astype(jnp.float32)
        summed = jnp.einsum("qld,ql->qd", gathered, mask)
        return jnp.sum((summed * inv_c[:, None]).T * w)

    lr, gr = jax.value_and_grad(loss_routed)(table)
    lx, gx = jax.value_and_grad(loss_ref)(table)
    assert float(lr) == pytest.approx(float(lx), rel=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gx),
                               rtol=1e-4, atol=1e-5)
