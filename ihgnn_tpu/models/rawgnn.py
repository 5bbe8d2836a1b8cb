"""RawGnn: embeddings → L GNN layers (full graph) → concat → HEM head.

Re-design of Models/RawGnn.py. The model is a pure function: training
recomputes the full-graph convolution every step (the reference's
semantics — the batch only selects which output rows receive gradients,
RawGnn.py:104-144); evaluation computes ``all_features`` once and reuses it
(the `save_features_for_test` protocol, RawGnn.py:147-158, here simply two
jitted entry points sharing the features array).

Feature dim after L layers: embedding_size * (1 + L) (RawGnn.py:49).
IHGNN layers after the first are forced to interaction order 1
(RawGnn.py:76-78).
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ihgnn_tpu.config import ModelConfig, V
from ihgnn_tpu.graph import Graph2D, HyperGraph, LogHyperGraph
from ihgnn_tpu.models.embedding import EmbeddingTables
from ihgnn_tpu.models.layers import GATLayer, GCNLayer, HGCNLayer, IHGNNLayer
from ihgnn_tpu.models.prediction import HemPredictionLayer

AnyGraph = Union[Graph2D, HyperGraph, LogHyperGraph]


class RawGnn(nn.Module):
    cfg: ModelConfig
    user_count: int
    query_count: int
    item_count: int
    vocab_size: int
    # embedding-table rows padded to a multiple of the mesh 'model' axis
    table_row_multiple: int = 1

    @property
    def query_start(self) -> int:
        return self.user_count

    @property
    def item_start(self) -> int:
        return self.user_count + self.query_count

    def setup(self):
        cfg = self.cfg
        d = cfg.embedding_size
        self.embeddings = EmbeddingTables(
            user_count=self.user_count,
            item_count=self.item_count,
            vocab_size=self.vocab_size,
            embedding_size=d,
            query_transform=cfg.query_transform,
            row_multiple=self.table_row_multiple,
        )
        layers = []
        for layer in range(cfg.gnn_layer_count):
            if cfg.gnn == V.GCN:
                layers.append(GCNLayer(d, d, name=f"gnn_{layer}"))
            elif cfg.gnn == V.GAT:
                layers.append(GATLayer(d, d, head=cfg.gat_head, name=f"gnn_{layer}"))
            elif cfg.gnn == V.HGCN:
                layers.append(HGCNLayer(d, d, name=f"gnn_{layer}"))
            elif cfg.gnn == V.IHGNN:
                layers.append(IHGNNLayer(
                    d, d,
                    interaction_order=cfg.layer_order(layer),
                    phase2_attention=cfg.phase2_attention,
                    gat_head=cfg.gat_head,
                    name=f"gnn_{layer}"))
            else:
                raise ValueError(f"unknown gnn layer {cfg.gnn!r}")
        self.gnns = layers
        self.prediction = HemPredictionLayer(
            item_count=self.item_count,
            lambda_muq=cfg.lambda_muq,
            use_cosine_similarity=cfg.use_cosine_similarity,
            name="prediction")

    def all_features(self, graph: AnyGraph, query_words: jnp.ndarray,
                     query_word_counts: jnp.ndarray) -> jnp.ndarray:
        """Full-graph forward: [N, embedding_size * (1 + L)]."""
        x = self.embeddings.all_features(query_words, query_word_counts)
        outs = [x]
        for gnn in self.gnns:
            if self.cfg.remat:
                # recompute the layer in backward: peak memory drops from
                # O(L * E * d) activations to O(E * d)
                x = nn.checkpoint(lambda mdl, h: mdl(h, graph))(gnn, x)
            else:
                x = gnn(x, graph)
            outs.append(x)
        return jnp.concatenate(outs, axis=1)

    def score(self, features: jnp.ndarray, users: jnp.ndarray,
              queries: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
        """Per-row scores for (user, query, item) triples ([R] each)."""
        uf = features[users]
        qf = features[queries + self.query_start]
        itf = features[items + self.item_start]
        return self.prediction.score_rows(uf, qf, itf, items)

    def score_all_items(self, features: jnp.ndarray, users: jnp.ndarray,
                        queries: jnp.ndarray) -> jnp.ndarray:
        """[B] (user, query) pairs → [B, item_count] full-catalog scores."""
        uf = features[users]
        qf = features[queries + self.query_start]
        item_f = features[self.item_start:]
        return self.prediction.score_all(uf, qf, item_f)

    def __call__(self, graph: AnyGraph, query_words: jnp.ndarray,
                 query_word_counts: jnp.ndarray, users: jnp.ndarray,
                 queries: jnp.ndarray, items: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        feats = self.all_features(graph, query_words, query_word_counts)
        if items is None:
            return self.score_all_items(feats, users, queries)
        return self.score(feats, users, queries, items)
