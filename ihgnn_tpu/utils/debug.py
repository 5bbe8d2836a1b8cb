"""Debug instrumentation — the Gs.Debug capability surface
(Helpers/GlobalSettings.py:98-108, hooks at Models/EmbeddingLayers.py:56-61
and Models/RawGnn.py:119-121): embedding-table and per-layer feature
statistics for diagnosing high-order feature scales."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np


def embedding_info(params) -> Tuple[float, float, float]:
    """(user, vocab, item) table abs-mean — EmbeddingLayers.py:56-61."""
    emb = params["params"]["embeddings"]
    return tuple(float(np.abs(np.asarray(emb[k])).mean())
                 for k in ("user_table", "vocab_table", "item_table"))


def feature_stats_from(feats, embedding_size: int, layer_count: int
                       ) -> List[Dict[str, float]]:
    """Per-GNN-layer output statistics (abs-mean / std) from precomputed
    full-graph features [N, d*(1+L)] — the `_calculate_highorder_info`
    capability. Pass the output of an already-jitted all_features call
    (eval's features_fn) — never recompute eagerly on TPU."""
    feats = np.asarray(feats)
    d = embedding_size
    # accept both layouts: feature-major [F, N] (RawGnn.all_features) and
    # row-major [N, F]; the stats are transpose-invariant
    if feats.shape[0] == d * (layer_count + 1):
        feats = feats.T
    out = []
    for layer in range(layer_count + 1):
        block = feats[:, layer * d:(layer + 1) * d]
        out.append({
            "layer": layer,
            "absmean": float(np.abs(block).mean()),
            "std": float(block.std()),
        })
    return out


def feature_stats(model, params, graph, query_words, query_word_counts
                  ) -> List[Dict[str, float]]:
    """Convenience wrapper that runs the (jitted) full-graph forward."""
    feats = jax.jit(
        lambda p: model.apply(p, graph, query_words, query_word_counts,
                              method=model.all_features))(params)
    return feature_stats_from(feats, model.cfg.embedding_size,
                              model.cfg.gnn_layer_count)
