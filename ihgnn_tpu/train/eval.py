"""Jitted full-catalog evaluation.

Replaces the reference's per-log python loop with a device-side pipeline
(TrainTestHelper.py:37-102 → SURVEY.md §7.1.5):

1. ``features_fn``  — one full-graph forward, cached for the whole eval
   (the `save_features_for_test` protocol, RawGnn.py:147-155).
2. ``metrics_fn``   — B logs at a time: [B, I] catalog scores via one MXU
   matmul, `top_k(10)`, vectorized HR/NDCG/MAP/MRR rows.

Host code only accumulates masked sums (plus optional per-log rows for the
long-tail statistic, Main.py:269-277).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.data.dataset import EvalLogs
from ihgnn_tpu.train.metrics import Metrics, ranking_metrics


def make_eval_fns(model, graph, query_words, query_word_counts):
    # graph enters the jitted program as an argument (bound at call time),
    # not a closure — closures bake large graphs into the HLO as literals
    graph = jax.tree_util.tree_map(jnp.asarray, graph)
    query_words = jnp.asarray(query_words)
    query_word_counts = jnp.asarray(query_word_counts)

    @jax.jit
    def _features(params, graph, query_words, query_word_counts):
        return model.apply(params, graph, query_words, query_word_counts,
                           method=model.all_features)

    def features_fn(params):
        return _features(params, graph, query_words, query_word_counts)

    @jax.jit
    def metrics_fn(params, features, users, queries, truth, truth_counts):
        scores = model.apply(params, features, users, queries,
                             method=model.score_all_items)
        return ranking_metrics(scores, truth, truth_counts)

    return features_fn, metrics_fn


def evaluate(params, features_fn, metrics_fn, logs: EvalLogs,
             batch_size: int, collect_rows: bool = False,
             features=None) -> Tuple[Metrics, Optional[np.ndarray], float]:
    """Average metrics over all valid logs.

    Returns (avg_metrics, per_log_rows or None, elapsed_seconds). Pass a
    precomputed ``features`` to share the full-graph forward between test
    and valid evaluations of the same epoch.
    """
    start = time.time()
    if features is None:
        features = features_fn(params)

    sums = np.zeros(4, np.float64)
    count = 0
    rows_out = [] if collect_rows else None

    for users, queries, truth, counts, weight in logs.batches(batch_size):
        rows = np.asarray(metrics_fn(params, features, users, queries, truth, counts))
        n = int(weight.sum())
        sums += rows[:n].sum(axis=0)
        count += n
        if collect_rows:
            rows_out.append(rows[:n])

    m = Metrics.from_row(sums / max(count, 1))
    per_log = np.concatenate(rows_out, axis=0) if collect_rows else None
    return m, per_log, time.time() - start
