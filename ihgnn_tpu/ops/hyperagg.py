"""Hyperedge aggregation ops with custom VJPs — Pallas fast path.

Two primitives cover every sparse movement in the hypergraph convolution
(SURVEY.md §2.3 kernel contract):

* ``gather_i3(x)``   — x[i3]: [N, d] node rows → [E, 3, d] endpoint rows.
  Backward is a scatter-add of cotangents into nodes = sorted CSR
  segment-sum over the node-major incidence.
* ``scatter_incidence(edge_feats)`` — H·E: [E, d] edge rows → [N, d] sums
  over each node's incident edges. Backward is cot[i3].sum(axis=1).

Both backward/forward scatters route through the Pallas node-tile kernel
(ops/pallas/segsum.py, ~55x over XLA's scatter lowering); the expansions
feeding it are XLA gathers producing feature-major [d, K_pad] operands.

Dispatch: the Pallas path activates when the graph carries packing arrays
(graph.py ``build_hypergraph``) and the default backend is TPU; otherwise
the XLA segment ops in ops/segment.py are used (CPU tests, multi-chip
GSPMD sharding, log-hypergraphs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ihgnn_tpu.graph import Graph2D, HyperGraph
from ihgnn_tpu.ops import segment as xla_ops
from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t


def use_pallas(graph) -> bool:
    return (getattr(graph, "pk_tile_ptr", None) is not None
            and getattr(graph, "edge_mask", None) is None
            and jax.default_backend() == "tpu")


def make_spmm_op(graph: Graph2D):
    """Symmetric-adjacency SpMM: x ↦ A @ x over the coalesced 2D graph.

    All 2D graph constructions are symmetric in both structure and values
    (Helpers/Graph.py:40-63 adds every edge in both directions with equal
    weights), so the VJP is the same SpMM applied to the cotangent."""
    n = graph.node_count

    if not use_pallas(graph):
        def spmm(x):
            return xla_ops.spmm(graph.row, graph.col, graph.val, x, n)
        return spmm

    col = jnp.asarray(graph.pk_col)
    val = jnp.asarray(graph.pk_val)
    ids2d = jnp.asarray(graph.pk_ids2d)
    tile_ptr = jnp.asarray(graph.pk_tile_ptr)

    def _apply(x):
        expanded_t = x.T[:, col] * val[None, :]
        return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n)

    @jax.custom_vjp
    def spmm(x):
        return _apply(x)

    def fwd(x):
        return _apply(x), None

    def bwd(_, cot):
        return (_apply(cot),)

    spmm.defvjp(fwd, bwd)
    return spmm


def make_hyper_ops(graph: HyperGraph):
    """Returns (gather_i3, scatter_incidence) closed over one graph."""
    n = graph.node_count

    if not use_pallas(graph):
        def gather_i3(x):
            return x[graph.i3]

        def scatter_incidence(edge_feats):
            return xla_ops.hyperedge_scatter(edge_feats, graph.inc_edge,
                                             graph.inc_node, n)

        return gather_i3, scatter_incidence

    i3 = jnp.asarray(graph.i3)
    ids2d = jnp.asarray(graph.pk_ids2d)
    tile_ptr = jnp.asarray(graph.pk_tile_ptr)
    perm_q = jnp.asarray(graph.pk_perm_q)
    perm_i = jnp.asarray(graph.pk_perm_i)
    e = graph.edge_count
    k_pad = graph.pk_ids2d.size
    pad = k_pad - 3 * e

    def _segsum_regions(u_part, q_part, i_part):
        """Region parts are [d, E] feature-major; the node-major expansion
        is their concatenation (u-region = identity because edges are
        numbered in user-sorted order — no gather on 1/3 of the entries)."""
        parts = [u_part, q_part[:, perm_q], i_part[:, perm_i]]
        if pad:
            parts.append(jnp.zeros((u_part.shape[0], pad), u_part.dtype))
        expanded_t = jnp.concatenate(parts, axis=1)
        return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n)

    @jax.custom_vjp
    def gather_i3(x):
        return x[i3]

    def gather_fwd(x):
        return x[i3], None

    def gather_bwd(_, cot):
        # entry j of region r holds cot[region_perm[j], r]
        return (_segsum_regions(cot[:, 0, :].T, cot[:, 1, :].T,
                                cot[:, 2, :].T),)

    gather_i3.defvjp(gather_fwd, gather_bwd)

    @jax.custom_vjp
    def scatter_incidence(edge_feats):
        eft = edge_feats.T
        return _segsum_regions(eft, eft, eft)

    def scatter_fwd(edge_feats):
        return scatter_incidence(edge_feats), None

    def scatter_bwd(_, cot):
        return (cot[i3].sum(axis=1),)

    scatter_incidence.defvjp(scatter_fwd, scatter_bwd)

    return gather_i3, scatter_incidence
