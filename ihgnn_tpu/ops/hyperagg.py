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

from ihgnn_tpu.graph import HyperGraph
from ihgnn_tpu.ops import segment as xla_ops
from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t


def use_pallas(graph: HyperGraph) -> bool:
    return (getattr(graph, "pk_tile_ptr", None) is not None
            and graph.edge_mask is None
            and jax.default_backend() == "tpu")


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
    inc_perm = jnp.asarray(graph.pk_inc_perm)    # [K_pad] node-major → 3e+r
    inc_edge = jnp.asarray(graph.pk_inc_edge)    # [K_pad] node-major → e
    ids2d = jnp.asarray(graph.pk_ids2d)
    tile_ptr = jnp.asarray(graph.pk_tile_ptr)

    def _segsum(flat_rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        # expansion in feature-major layout feeds the kernel directly
        expanded_t = flat_rows.T[:, idx]
        return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n)

    @jax.custom_vjp
    def gather_i3(x):
        return x[i3]

    def gather_fwd(x):
        return x[i3], None

    def gather_bwd(_, cot):
        flat = cot.reshape(-1, cot.shape[-1])    # [3E, d], row 3e+r
        return (_segsum(flat, inc_perm),)

    gather_i3.defvjp(gather_fwd, gather_bwd)

    @jax.custom_vjp
    def scatter_incidence(edge_feats):
        return _segsum(edge_feats, inc_edge)

    def scatter_fwd(edge_feats):
        return scatter_incidence(edge_feats), None

    def scatter_bwd(_, cot):
        return (cot[i3].sum(axis=1),)

    scatter_incidence.defvjp(scatter_fwd, scatter_bwd)

    return gather_i3, scatter_incidence
