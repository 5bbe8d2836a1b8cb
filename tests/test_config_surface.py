"""Coverage for secondary config knobs: GAT product head, query activation
transform, cosine-similarity prediction, graph completeness variants, CLI
parsing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihgnn_tpu.config import ModelConfig, V, parse_args
from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.models.layers import GATLayer
from ihgnn_tpu.models.rawgnn import RawGnn

D = 8


@pytest.fixture(scope="module")
def data():
    return make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)


def test_gat_product_head(data):
    g = data.graph2d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.node_count, D)).astype(np.float32))
    layer = GATLayer(D, D, head=V.PRODUCT)
    params = layer.init(jax.random.key(0), x.T, g)
    out = np.asarray(layer.apply(params, x.T, g)).T
    assert out.shape == (g.node_count, D) and np.isfinite(out).all()

    # oracle: score = LeakyReLU(Linear(x_src * x_dst)), softmax over dst
    w, b = (np.asarray(params["params"]["feature_transform"]["dense"][k])
            for k in ("kernel", "bias"))
    ph = params["params"]["gat"]["feature_aggregate"]
    wa, ba = np.asarray(ph["kernel"]), np.asarray(ph["bias"])
    xt = x @ w + b
    src, dst = np.asarray(g.row), np.asarray(g.col)
    s = (xt[src] * xt[dst]) @ wa + ba
    s = np.where(s > 0, s, 0.01 * s)[:, 0]
    expect = np.zeros_like(np.asarray(xt))
    for d_node in np.unique(dst):
        m = dst == d_node
        e = np.exp(s[m] - s[m].max())
        expect[d_node] = (np.asarray(xt)[src[m]] * (e / e.sum())[:, None]).sum(0)
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-4)


def _make_model(data, **kw):
    cfg = ModelConfig(embedding_size=D, gnn_layer_count=1, **kw)
    return cfg, RawGnn(cfg=cfg, user_count=data.user_count,
                       query_count=data.query_count,
                       item_count=data.item_count,
                       vocab_size=data.vocab_size)


def test_query_activation_transform(data):
    cfg, model = _make_model(data, query_transform=V.ACTIVATION)
    g = data.hypergraph
    u = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), g, data.query_words,
                        data.query_word_counts, u, u, u)
    assert "query_mlp" in params["params"]["embeddings"]
    feats = model.apply(params, g, data.query_words, data.query_word_counts,
                        method=model.all_features)
    # ReLU output of the transform: query block is non-negative
    qblock = np.asarray(feats)[:D, data.query_start:data.item_start]
    assert (qblock >= 0).all()


def test_cosine_similarity_prediction(data):
    cfg, model = _make_model(data, use_cosine_similarity=True)
    g = data.hypergraph
    users = jnp.array([0, 1], jnp.int32)
    queries = jnp.array([0, 1], jnp.int32)
    items = jnp.array([0, 1], jnp.int32)
    params = model.init(jax.random.key(0), g, data.query_words,
                        data.query_word_counts, users, queries, items)
    scores = model.apply(params, g, data.query_words, data.query_word_counts,
                         users, queries, items)
    bias = np.asarray(params["params"]["prediction"]["items_bias"])
    # cosine term bounded by 1 in magnitude
    assert np.all(np.abs(np.asarray(scores) - bias[:2]) <= 1.0 + 1e-5)
    # score_all consistent with row scoring
    feats = model.apply(params, g, data.query_words, data.query_word_counts,
                        method=model.all_features)
    all_s = model.apply(params, feats, users, queries,
                        method=model.score_all_items)
    np.testing.assert_allclose(np.asarray(all_s)[[0, 1], [0, 1]],
                               np.asarray(scores), rtol=1e-4, atol=1e-5)


def test_cli_parsing_roundtrip():
    cfg = parse_args([
        "--dataset", "/tmp/x", "--model", "RawGnn", "--gnn", "IHGNN",
        "--gnns", "3", "--feature_order", "2", "--emb", "64",
        "--completeness", "uq", "--epoch_count", "50", "--est", "5",
        "--etf", "5", "--storemetrics", "--longtail", "lt.csv",
        "--mesh_data", "2", "--mesh_model", "2", "--checkpoint", "latest",
        "--neg_random", "7", "--remat",
    ])
    m, t = cfg.model, cfg.train
    assert m.model == V.RAWGNN and m.gnn == V.IHGNN
    assert m.gnn_layer_count == 3 and m.feature_interaction_order == 2
    assert m.embedding_size == 64 and m.graph_completeness == "uq"
    assert m.remat
    assert t.epoch_count == 50 and t.epoch_start_test == 5
    assert t.random_negative_sample_size == 7
    assert cfg.mesh.data == 2 and cfg.mesh.model == 2
    assert cfg.io.checkpoint == "latest" and cfg.io.store_metrics
    assert cfg.io.long_tail_filename == "lt.csv"


def test_cli_rejects_bad_values():
    with pytest.raises(ValueError):
        parse_args(["--gnn", "transformer"])
    with pytest.raises(ValueError):
        parse_args(["--completeness", "weird"])
    with pytest.raises(ValueError):
        parse_args(["--feature_order", "4"])
