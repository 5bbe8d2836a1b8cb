"""GNN layers: GCN, GAT, HGCN, IHGNN — as pure functions of (features, graph).

Re-designs Models/GnnLayers.py. Every aggregation is expressed through the
segment-op contract in ops/segment.py (sorted segment sums / softmaxes), so
the same code runs single-chip, on a CPU test mesh, and under shard_map with
hyperedges sharded over the 'data' mesh axis.

Shape/math parity notes (vs the reference):
* GCNLayer   — Dv^-1/2 · A · Dv^-1/2 · X · W, transform applied first when
  in_dim >= out_dim (GnnLayers.py:28-45).
* GATLayer   — per-edge score from Linear over [x_src ; x_dst] (concat head)
  or x_src ⊙ x_dst (product head), LeakyReLU, softmax per destination,
  weighted sum of source features at the destination (GnnLayers.py:96-115).
* HGCNLayer  — Dv^-1/2 · H · De^-1 · Hᵀ · Dv^-1/2 · X · W (GnnLayers.py:142-153).
* IHGNNLayer — X' = XW; E = FeatureInteractor(X'); out = Dv^-1 · H · E, or
  a phase-2 GAT over the bipartite (edge-nodes ∪ nodes) graph
  (GnnLayers.py:221-236).
"""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import jax.numpy as jnp

from ihgnn_tpu.config import V
from ihgnn_tpu.graph import Graph2D, HyperGraph, LogHyperGraph
from ihgnn_tpu.models.common import TorchDense, leaky_relu
from ihgnn_tpu.models.initializers import (LEAKY_RELU_GAIN, torch_linear_bias,
                                           xavier_uniform)
from ihgnn_tpu.models.interaction import FeatureInteractor
from ihgnn_tpu.ops import segment_softmax, segment_sum, spmm
from ihgnn_tpu.ops.hyperagg import make_hyper_ops, make_spmm_op


class GCNLayer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: Graph2D) -> jnp.ndarray:
        transform = TorchDense(self.out_dim, self.in_dim, name="feature_transform")
        d_inv_sqrt = graph.dv ** -0.5                     # [N, 1]
        adj = make_spmm_op(graph)

        def conv(h):
            return d_inv_sqrt * adj(d_inv_sqrt * h)

        # cheaper side first (GnnLayers.py:33-43)
        if self.in_dim >= self.out_dim:
            return conv(transform(x))
        return transform(conv(x))


class _GatCore(nn.Module):
    """Attention scoring + destination-softmax aggregation over an edge list
    sorted by destination. Shared by GATLayer and IHGNN phase-2 attention."""

    out_dim: int
    head: str = V.CONCAT

    @nn.compact
    def __call__(self, x: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                 node_count: int) -> jnp.ndarray:
        """x: [N, out_dim] already-transformed features; (src, dst): edges
        sorted by dst; returns [node_count, out_dim]."""
        score_in = 2 * self.out_dim if self.head == V.CONCAT else self.out_dim
        score_head = nn.Dense(
            1,
            kernel_init=xavier_uniform(LEAKY_RELU_GAIN),
            bias_init=torch_linear_bias(score_in),
            name="feature_aggregate",
        )

        x_src, x_dst = x[src], x[dst]
        if self.head == V.CONCAT:
            pair = jnp.concatenate([x_src, x_dst], axis=1)
        else:
            pair = x_src * x_dst
        scores = leaky_relu(score_head(pair))[:, 0]        # [nnz]

        w = segment_softmax(scores, dst, node_count, indices_are_sorted=True)
        return segment_sum(x_src * w[:, None], dst, node_count,
                           indices_are_sorted=True)


class GATLayer(nn.Module):
    in_dim: int
    out_dim: int
    head: str = V.CONCAT

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: Graph2D) -> jnp.ndarray:
        x = TorchDense(self.out_dim, self.in_dim, name="feature_transform")(x)
        # re-order the coalesced COO entries by destination so the softmax
        # and the weighted sum are sorted segment ops
        src = graph.row[graph.dst_order]
        dst = graph.col[graph.dst_order]
        return _GatCore(self.out_dim, self.head, name="gat")(x, src, dst,
                                                             graph.node_count)


AnyHyperGraph = Union[HyperGraph, LogHyperGraph]


def _edge_mean(x: jnp.ndarray, graph: AnyHyperGraph) -> jnp.ndarray:
    """De^-1 · Hᵀ · x — mean of member-node features per hyperedge."""
    if isinstance(graph, HyperGraph):
        gather, _ = make_hyper_ops(graph)
        edge = gather(x).sum(axis=1) / 3.0
        if graph.edge_mask is not None:
            edge = edge * graph.edge_mask
        return edge
    summed = segment_sum(x[graph.edge_nodes], graph.edge_ids,
                         graph.edge_count, indices_are_sorted=True)
    return summed / graph.de


def _edge_scatter(edge_feats: jnp.ndarray, graph: AnyHyperGraph) -> jnp.ndarray:
    """H · E — sum of member-edge features per node (sorted incidence)."""
    if isinstance(graph, HyperGraph):
        _, scatter = make_hyper_ops(graph)
        return scatter(edge_feats)
    return segment_sum(edge_feats[graph.inc_edge], graph.inc_node,
                       graph.node_count, indices_are_sorted=True)


class HGCNLayer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: AnyHyperGraph) -> jnp.ndarray:
        x = TorchDense(self.out_dim, self.in_dim, name="feature_transform")(x)
        d_inv_sqrt = graph.dv ** -0.5
        x = d_inv_sqrt * x
        edge = _edge_mean(x, graph)
        return d_inv_sqrt * _edge_scatter(edge, graph)


class IHGNNLayer(nn.Module):
    in_dim: int
    out_dim: int
    interaction_order: int = 3
    phase2_attention: bool = False
    gat_head: str = V.CONCAT

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: HyperGraph) -> jnp.ndarray:
        x = TorchDense(self.out_dim, self.in_dim, name="feature_transform")(x)
        gather, _ = make_hyper_ops(graph)
        edge = FeatureInteractor(self.interaction_order, self.out_dim,
                                 self.out_dim, name="interactor")(gather(x))
        if graph.edge_mask is not None:
            edge = edge * graph.edge_mask  # zero padded edges (even sharding)

        if self.phase2_attention:
            # GAT over the bipartite graph whose edges run from hyperedge
            # nodes (id = edge + N) to their member nodes; the incidence
            # arrays are already sorted by member node = destination
            # (GnnLayers.py:200-216,227-230).
            n, e = graph.node_count, graph.edge_count
            both = jnp.concatenate([x, edge], axis=0)       # [N+E, d]
            both = TorchDense(self.out_dim, self.out_dim,
                              name="phase2_transform")(both)
            src = graph.inc_edge + n
            dst = graph.inc_node
            out = _GatCore(self.out_dim, self.gat_head,
                           name="phase2_gat")(both, src, dst, n + e)
            return out[:n]

        # node update: Dv^-1 · H · E (GnnLayers.py:232-234)
        return _edge_scatter(edge, graph) / graph.dv
