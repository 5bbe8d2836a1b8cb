"""Utility coverage: tee logger, debug stats, artifact writer roundtrip,
Srrl HEM-prediction variant."""

import os

import jax
import numpy as np
import pytest

from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
from ihgnn_tpu.data.artifacts import write_synthetic_dataset
from ihgnn_tpu.data.dataset import GraphData
from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.models.rawgnn import RawGnn
from ihgnn_tpu.models.srrl import Srrl
from ihgnn_tpu.utils.debug import embedding_info, feature_stats
from ihgnn_tpu.utils.logging import TeeLogger


def test_tee_logger_strips_ansi(tmp_path, capsys):
    fn = str(tmp_path / "log.txt")
    logger = TeeLogger(fn)
    logger.log("plain \033[0;44mcolored\033[0m text")
    logger.log("two\nlines")
    logger.close()
    out = capsys.readouterr().out
    assert "\033[0;44m" in out                      # colors on stdout
    content = open(fn).read()
    assert "\033" not in content                    # stripped in file
    assert "colored" in content
    assert content.count("[") >= 3                  # timestamps per line


def test_debug_stats():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)
    cfg = ModelConfig(embedding_size=8, gnn_layer_count=2)
    model = RawGnn(cfg=cfg, user_count=data.user_count,
                   query_count=data.query_count, item_count=data.item_count,
                   vocab_size=data.vocab_size)
    g = data.hypergraph
    u = np.zeros(1, np.int32)
    params = model.init(jax.random.key(0), g, data.query_words,
                        data.query_word_counts, u, u, u)
    info = embedding_info(params)
    assert len(info) == 3 and all(v > 0 for v in info)
    stats = feature_stats(model, params, g, data.query_words,
                          data.query_word_counts)
    assert [s["layer"] for s in stats] == [0, 1, 2]
    assert all(np.isfinite(s["absmean"]) for s in stats)


def test_synthetic_artifact_roundtrip(tmp_path):
    out = str(tmp_path / "ds")
    write_synthetic_dataset(out, seed=5, user_count=12, query_count=8,
                            item_count=20, vocab_size=15, log_count=100)
    data = GraphData.from_files(out)
    assert data.user_count == 12 and data.item_count == 20
    assert data.pos_count > 0
    # vocabulary file row count matches graph_info
    vocab_rows = len(open(os.path.join(out, "vocabulary.txt")).readlines())
    assert vocab_rows == data.vocab_size


def test_srrl_hem_prediction_variant():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)
    cfg = ModelConfig(embedding_size=8)
    model = Srrl(cfg=cfg, user_count=data.user_count,
                 query_count=data.query_count, item_count=data.item_count,
                 vocab_size=data.vocab_size, prediction="hem")
    params = jax.jit(lambda r: model.init(r, data.query_words,
                                          data.query_word_counts,
                                          method=model.init_all))(
                                              jax.random.key(0))
    assert "prediction" in params["params"]
    feats = model.apply(params, data.query_words, data.query_word_counts,
                        method=model.all_features)
    users = np.array([0, 1], np.int32)
    scores = model.apply(params, feats, users, users,
                         method=model.score_all_items)
    assert scores.shape == (2, data.item_count)
    assert np.isfinite(np.asarray(scores)).all()
