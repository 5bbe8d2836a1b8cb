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
                    bf16_stream=cfg.bf16_stream,
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
        """Full-graph forward, feature-major: [embedding_size * (1 + L), N].

        Feature-major keeps the node axis on the 128-lane minor dimension;
        [N, 32] layouts are lane-padded 4x on TPU."""
        # the single-chip routed bag op is a naked pallas_call — only safe
        # when the graph (and thus the program) is not GSPMD-sharded; mesh
        # runs need the shard_map variant (ops/bag.ShardedBagPack, built by
        # parallel/sharding.pad_*_for_mesh from the dataset word matrix)
        from ihgnn_tpu.ops.bag import ShardedBagPack
        bag = getattr(graph, "bag", None)
        if (getattr(graph, "skp", None) is not None
                and not isinstance(bag, ShardedBagPack)):
            bag = None
        x_t = self.embeddings.all_features_t(
            query_words, query_word_counts, bag=bag)
        outs = [x_t]
        for gnn in self.gnns:
            if self.cfg.remat:
                # recompute the layer in backward: peak memory drops from
                # O(L * E * d) activations to O(E * d). graph must be an
                # explicit argument — its arrays are traced inputs
                x_t = nn.checkpoint(lambda mdl, h, g: mdl(h, g))(gnn, x_t, graph)
            else:
                x_t = gnn(x_t, graph)
            outs.append(x_t)
        return jnp.concatenate(outs, axis=0)

    def score(self, features_t: jnp.ndarray, users: jnp.ndarray,
              queries: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
        """Per-row scores for (user, query, item) triples ([R] each)."""
        uf = features_t[:, users].T
        qf = features_t[:, queries + self.query_start].T
        itf = features_t[:, items + self.item_start].T
        return self.prediction.score_rows(uf, qf, itf, items)

    def score_all_items(self, features_t: jnp.ndarray, users: jnp.ndarray,
                        queries: jnp.ndarray) -> jnp.ndarray:
        """[B] (user, query) pairs → [B, item_count] full-catalog scores."""
        uf_t = features_t[:, users]
        qf_t = features_t[:, queries + self.query_start]
        items_t = features_t[:, self.item_start:]
        return self.prediction.score_all_t(uf_t, qf_t, items_t)

    def _tail_restricted_ok(self, graph, items) -> bool:
        """Edge-sharded training-score path where the LAST layer's output
        is only read at batch node rows — its full [d, N] cross-shard
        combine can then shrink to a batch-column psum
        (docs/PARALLELISM.md "tail psum"; IHGNNLayer ``out_nodes``)."""
        from ihgnn_tpu.config import V
        return (items is not None
                and getattr(graph, "skp", None) is not None
                and self.cfg.gnn == V.IHGNN
                and not self.cfg.phase2_attention
                and len(self.gnns) >= 1)

    def _score_tail_restricted(self, graph, query_words, query_word_counts,
                               users, queries, items):
        nodes = jnp.concatenate([users, queries + self.query_start,
                                 items + self.item_start])
        from ihgnn_tpu.ops.bag import ShardedBagPack
        bag = getattr(graph, "bag", None)
        if not isinstance(bag, ShardedBagPack):
            bag = None
        x_t = self.embeddings.all_features_t(
            query_words, query_word_counts, bag=bag)
        rows = [x_t[:, nodes]]
        last = len(self.gnns) - 1
        for k, gnn in enumerate(self.gnns):
            if k == last:
                rows.append(nn.checkpoint(
                    lambda mdl, h, g, nds: mdl(h, g, out_nodes=nds))(
                        gnn, x_t, graph, nodes)
                    if self.cfg.remat else gnn(x_t, graph, out_nodes=nodes))
            else:
                x_t = (nn.checkpoint(lambda mdl, h, g: mdl(h, g))(
                    gnn, x_t, graph) if self.cfg.remat
                    else gnn(x_t, graph))
                rows.append(x_t[:, nodes])
        feats_rows = jnp.concatenate(rows, axis=0)      # [(1+L)d, 3R]
        r = users.shape[0]
        uf = feats_rows[:, :r].T
        qf = feats_rows[:, r:2 * r].T
        itf = feats_rows[:, 2 * r:].T
        return self.prediction.score_rows(uf, qf, itf, items)

    def __call__(self, graph: AnyGraph, query_words: jnp.ndarray,
                 query_word_counts: jnp.ndarray, users: jnp.ndarray,
                 queries: jnp.ndarray, items: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        if self._tail_restricted_ok(graph, items):
            return self._score_tail_restricted(
                graph, query_words, query_word_counts, users, queries,
                items)
        feats = self.all_features(graph, query_words, query_word_counts)
        if items is None:
            return self.score_all_items(feats, users, queries)
        return self.score(feats, users, queries, items)
