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


def feature_stats(model, params, graph, query_words, query_word_counts
                  ) -> List[Dict[str, float]]:
    """Per-GNN-layer output statistics (abs-mean / std) of the full-graph
    forward — the `_calculate_highorder_info` capability."""
    feats = model.apply(params, graph, query_words, query_word_counts,
                        method=model.all_features)
    feats = np.asarray(feats)
    d = model.cfg.embedding_size
    out = []
    for layer in range(model.cfg.gnn_layer_count + 1):
        block = feats[:, layer * d:(layer + 1) * d]
        out.append({
            "layer": layer,
            "absmean": float(np.abs(block).mean()),
            "std": float(block.std()),
        })
    return out
