"""GNN layers: GCN, GAT, HGCN, IHGNN — pure functions of (features, graph).

Re-designs Models/GnnLayers.py. Layer interfaces are **feature-major**
(x_t: [d, N]): on TPU a [N, 32] array is lane-padded 4x, so the node/edge
axis must be the 128-lane minor axis. Every aggregation routes through the
segment-op contract in ops/hyperagg.py (Pallas CSR kernels on TPU, XLA
segment ops elsewhere).

Math parity (vs the reference):
* GCNLayer   — Dv^-1/2 · A · Dv^-1/2 · X · W, transform applied first when
  in_dim >= out_dim (GnnLayers.py:28-45).
* GATLayer   — per-edge score from Linear over [x_src ; x_dst] (concat
  head) or x_src ⊙ x_dst (product), LeakyReLU, softmax per destination,
  weighted source sum at the destination (GnnLayers.py:96-115). Runs
  row-major internally (segment softmax over ragged degrees).
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
from ihgnn_tpu.models.common import TorchDense, TorchDenseT, leaky_relu
from ihgnn_tpu.models.initializers import (LEAKY_RELU_GAIN, torch_linear_bias,
                                           xavier_uniform)
from ihgnn_tpu.models.interaction import FeatureInteractor
from ihgnn_tpu.ops import segment_softmax, segment_sum
from ihgnn_tpu.ops.hyperagg import make_hyper_ops, make_spmm_op, use_pallas


def _dv_inv_sqrt_t(graph) -> jnp.ndarray:
    return (graph.dv ** -0.5).reshape(1, -1)


class GCNLayer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, graph: Graph2D) -> jnp.ndarray:
        transform = TorchDenseT(self.out_dim, self.in_dim,
                                name="feature_transform")
        d_inv_sqrt = _dv_inv_sqrt_t(graph)
        adj = make_spmm_op(graph)

        def conv(h_t):
            return d_inv_sqrt * adj(d_inv_sqrt * h_t)

        # cheaper side first (GnnLayers.py:33-43)
        if self.in_dim >= self.out_dim:
            return conv(transform(x_t))
        return transform(conv(x_t))


class _GatCore(nn.Module):
    """Attention scoring + destination-softmax aggregation over an edge list
    sorted by destination (row-major features — segment softmax over ragged
    in-degrees). Shared by GATLayer and IHGNN phase-2 attention.

    ``entry_mask`` (float/bool [nnz], optional) excludes padded entries from
    the attention: unlike GCN, the score is computed purely from features,
    so a zero-value padding entry would otherwise take real softmax mass."""

    out_dim: int
    head: str = V.CONCAT

    @nn.compact
    def __call__(self, x: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                 node_count: int, entry_mask=None) -> jnp.ndarray:
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

        if entry_mask is not None:
            # finite sentinel (not -inf): an all-masked segment then yields
            # uniform weights instead of NaN, killed by the final multiply
            scores = jnp.where(entry_mask > 0, scores, -1e30)
        w = segment_softmax(scores, dst, node_count, indices_are_sorted=True)
        if entry_mask is not None:
            w = w * (entry_mask > 0)
        return segment_sum(x_src * w[:, None], dst, node_count,
                           indices_are_sorted=True)


class _GatHeadParams(nn.Module):
    """Bare score-head params — same names/shapes/inits as `_GatCore`'s
    nn.Dense, so the routed and row-major paths share checkpoints."""

    score_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_uniform(LEAKY_RELU_GAIN),
                            (self.score_in, 1))
        bias = self.param("bias", torch_linear_bias(self.score_in), (1,))
        return kernel, bias


class _GatHead(nn.Module):
    """Nesting shim: mirrors _GatCore("gat")/Dense("feature_aggregate")."""

    score_in: int

    @nn.compact
    def __call__(self):
        return _GatHeadParams(self.score_in, name="feature_aggregate")()


class GATLayer(nn.Module):
    in_dim: int
    out_dim: int
    head: str = V.CONCAT

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, graph: Graph2D) -> jnp.ndarray:
        gat_pk = getattr(graph, "gat_pk", None)
        if use_pallas(graph) and gat_pk is not None:
            # routed feature-major path (round 5, ops/gatconv.py): the
            # row-major x[src] gathers + XLA segment softmax measured
            # 3,221 ms fwd at 12M nnz (docs/GAT_PROBE.json); the routed
            # pipeline runs the same math on the Clos/windowed kernels
            from ihgnn_tpu.ops.gatconv import gat_conv_t
            xt = TorchDenseT(self.out_dim, self.in_dim,
                             name="feature_transform")(x_t)
            score_in = (2 * self.out_dim if self.head == V.CONCAT
                        else self.out_dim)
            khead, bhead = _GatHead(score_in, name="gat")()
            head = "concat" if self.head == V.CONCAT else "product"
            return gat_conv_t(xt, khead, bhead, gat_pk, head)
        x = TorchDense(self.out_dim, self.in_dim,
                       name="feature_transform")(x_t.T)
        # re-order the coalesced COO entries by destination so the softmax
        # and the weighted sum are sorted segment ops
        src = graph.row[graph.dst_order]
        dst = graph.col[graph.dst_order]
        # val==0 marks mesh-padding entries (parallel/sharding.py
        # pad_graph2d_for_mesh); real coalesced entries always have val>=1
        out = _GatCore(self.out_dim, self.head, name="gat")(
            x, src, dst, graph.node_count,
            entry_mask=graph.val[graph.dst_order])
        return out.T


AnyHyperGraph = Union[HyperGraph, LogHyperGraph]


class HGCNLayer(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, graph: AnyHyperGraph) -> jnp.ndarray:
        x_t = TorchDenseT(self.out_dim, self.in_dim,
                          name="feature_transform")(x_t)
        d_inv_sqrt = _dv_inv_sqrt_t(graph)
        x_t = d_inv_sqrt * x_t

        if isinstance(graph, HyperGraph):
            gather, scatter = make_hyper_ops(graph)
            g = gather(x_t)                                 # [3, d, E]
            edge_t = (g[0] + g[1] + g[2]) / 3.0
            if graph.edge_mask is not None:
                edge_t = edge_t * graph.edge_mask.reshape(1, -1)
            return d_inv_sqrt * scatter(edge_t)

        # ragged log-hypergraph: row-major segment ops
        x = x_t.T
        summed = segment_sum(x[graph.edge_nodes], graph.edge_ids,
                             graph.edge_count, indices_are_sorted=True)
        edge = summed / graph.de
        out = segment_sum(edge[graph.inc_edge], graph.inc_node,
                          graph.node_count, indices_are_sorted=True)
        return (d_inv_sqrt.T * out).T


class IHGNNLayer(nn.Module):
    in_dim: int
    out_dim: int
    interaction_order: int = 3
    phase2_attention: bool = False
    gat_head: str = V.CONCAT
    bf16_stream: bool = False    # half-width [d, E] streams (hyperagg.py)

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, graph: HyperGraph,
                 out_nodes=None) -> jnp.ndarray:
        """``out_nodes`` ([K] int32, optional): edge-sharded graphs only —
        return the node update restricted to these node columns
        ([d, K] instead of [d, N]) via the batch-restricted psum
        (hyperagg.scatter_incidence_rows_t). Used by RawGnn for the LAST
        layer, whose output is only read at the batch's node rows — the
        full [d, N] cross-shard combine is then skipped entirely
        (docs/PARALLELISM.md "tail psum")."""
        x_t = TorchDenseT(self.out_dim, self.in_dim,
                          name="feature_transform")(x_t)
        # i-role final-stage absorption into the fused interaction
        # (hyperagg.absorb_i_ok): single-chip σ packs on the Pallas path,
        # not under phase-2 attention (which consumes edge_t only — the
        # second output would be dead work)
        from ihgnn_tpu.ops.hyperagg import absorb_i_ok, absorb_tables
        kp = getattr(graph, "kp", None)
        stream = jnp.bfloat16 if self.bf16_stream else jnp.float32
        absorb = (use_pallas(graph) and not self.phase2_attention
                  and absorb_i_ok(kp, self.out_dim, stream))
        gather, scatter = make_hyper_ops(graph, bf16_stream=self.bf16_stream,
                                         absorb=absorb)
        # edge-sharded graphs run the fused interaction per shard under
        # shard_map (the role streams are sharded on 'data')
        skp = getattr(graph, "skp", None)
        edge_t = FeatureInteractor(self.interaction_order, self.out_dim,
                                   self.out_dim, name="interactor")(
                                       gather(x_t), fused_ok=use_pallas(graph),
                                       mesh=None if skp is None else skp.mesh,
                                       absorb=absorb_tables(kp)
                                       if absorb else None)
        if absorb:
            # edge_t is the (o1 σ-ordered, o2 ρ-permuted) pair; scatter
            # consumes the pair, everything else reads o1
            return scatter(edge_t) / graph.dv.reshape(1, -1)
        if graph.edge_mask is not None:
            edge_t = edge_t * graph.edge_mask.reshape(1, -1)

        if out_nodes is not None and skp is not None \
                and not self.phase2_attention:
            from ihgnn_tpu.ops.hyperagg import scatter_incidence_rows_t
            out = scatter_incidence_rows_t(graph, edge_t, out_nodes)
            dv_sel = graph.dv.reshape(-1)[out_nodes]
            return out / dv_sel.reshape(1, -1)

        if self.phase2_attention:
            # GAT over the bipartite graph whose edges run from hyperedge
            # nodes (id = edge + N) to their member nodes; incidence arrays
            # are already sorted by member node = destination
            # (GnnLayers.py:200-216,227-230). Row-major internally.
            # σ packs hold edge features in a row-local scramble of edge
            # order — re-label before indexing by edge id. Only when the
            # Pallas pack actually produced edge_t (XLA fallback keeps
            # true edge order).
            kp = getattr(graph, "kp", None)
            if (use_pallas(graph) and kp is not None
                    and getattr(kp, "sigma", False)):
                from ihgnn_tpu.ops.hyperagg import sigma_to_edge_order
                edge_t = sigma_to_edge_order(edge_t, kp)[:, :graph.edge_count]
            n, e = graph.node_count, graph.edge_count
            both = jnp.concatenate([x_t.T, edge_t.T.astype(x_t.dtype)],
                                   axis=0)                      # [N+E, d]
            both = TorchDense(self.out_dim, self.out_dim,
                              name="phase2_transform")(both)
            src = graph.inc_edge + n
            dst = graph.inc_node
            inc_mask = (None if graph.edge_mask is None
                        else graph.edge_mask.reshape(-1)[graph.inc_edge])
            out = _GatCore(self.out_dim, self.gat_head,
                           name="phase2_gat")(both, src, dst, n + e,
                                              entry_mask=inc_mask)
            return out[:n].T

        # node update: Dv^-1 · H · E (GnnLayers.py:232-234)
        return scatter(edge_t) / graph.dv.reshape(1, -1)
