"""Checkpoint save/restore roundtrip and evaluator-vs-host-oracle parity."""

import dataclasses

import jax
import numpy as np
import pytest

from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
from ihgnn_tpu.data.dataset import TrainSampler
from ihgnn_tpu.data.synthetic import make_synthetic_splits
from ihgnn_tpu.models.rawgnn import RawGnn
from ihgnn_tpu.train.checkpoint import (find_latest, restore_checkpoint,
                                        save_checkpoint)
from ihgnn_tpu.train.eval import evaluate, make_eval_fns
from ihgnn_tpu.train.metrics import Metrics
from ihgnn_tpu.train.train import init_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def trained():
    cfg = Config(model=ModelConfig(embedding_size=8, gnn_layer_count=1),
                 train=TrainConfig(batch_size=16, random_negative_sample_size=4))
    train, valid, test = make_synthetic_splits(
        user_count=8, query_count=6, item_count=12, vocab_size=10,
        log_count=60, seed=3)
    model = RawGnn(cfg=cfg.model, user_count=train.user_count,
                   query_count=train.query_count, item_count=train.item_count,
                   vocab_size=train.vocab_size)
    g = train.hypergraph
    tx = make_optimizer(cfg)
    state = init_state(model, jax.random.key(0), g, train.query_words,
                       train.query_word_counts, cfg, tx)
    step = make_train_step(model, g, train.query_words,
                           train.query_word_counts, tx)
    for batch in TrainSampler(train, 16, 4, seed=0).epoch():
        state, _ = step(state, batch)
    return cfg, train, test, model, state


def test_checkpoint_roundtrip(tmp_path, trained):
    cfg, train, test, model, state = trained
    name = save_checkpoint(str(tmp_path), 7, jax.device_get(state))
    assert find_latest(str(tmp_path)) == name
    epoch, restored = restore_checkpoint(str(tmp_path), "latest",
                                         jax.device_get(state))
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_matches_host_oracle(trained):
    """The batched jitted evaluator must equal the reference's per-log loop
    (host Metrics over per-log full-catalog scores)."""
    cfg, train, test, model, state = trained
    g = train.hypergraph
    features_fn, metrics_fn = make_eval_fns(model, g, train.query_words,
                                            train.query_word_counts)
    m, rows, _ = evaluate(state.params, features_fn, metrics_fn, test,
                          batch_size=7, collect_rows=True)

    feats = features_fn(state.params)
    oracle = Metrics()
    for li in range(test.count):
        scores = model.apply(state.params, feats,
                             np.asarray([test.users[li]]),
                             np.asarray([test.queries[li]]),
                             method=model.score_all_items)
        truth = list(test.truth[li][:test.truth_counts[li]])
        oracle.add_to_self(Metrics.calculate_on_all_items(
            np.asarray(scores)[0], truth, None, True))
    oracle = oracle.divide_and_get_new(test.count)

    assert m.HitRatio_at10 == pytest.approx(oracle.HitRatio_at10, abs=1e-5)
    assert m.NDCG_at10 == pytest.approx(oracle.NDCG_at10, abs=1e-5)
    assert m.MAP_at10 == pytest.approx(oracle.MAP_at10, abs=1e-5)
    assert m.MRR_at10 == pytest.approx(oracle.MRR_at10, abs=1e-5)
