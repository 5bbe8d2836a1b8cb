"""Segment/scatter primitives — the kernel contract of the framework.

These re-provide, TPU-natively, the native-kernel surface the reference gets
from torch_sparse/dgl (SURVEY.md §2.3):

* ``spmm``               <- torch_sparse.matmul (CSR SpMM)
* ``hyperedge_scatter``  <- H·E incidence aggregation (SpMM scatter side)
* ``hyperedge_gather``   <- Hᵀ·X (fixed-degree gather side)
* ``segment_softmax``    <- dgl.ops.edge_softmax
* weighted segment sums  <- dgl.ops.u_mul_e_sum

All functions take *pre-sorted* index arrays (graph.py guarantees node-major
sorting), so XLA lowers them to sequential segment reductions rather than
atomic scatters. The Pallas backend (ops/pallas/) provides fused variants of
the hyperedge ops; these XLA versions are the reference semantics and the
fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_max(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    return jax.ops.segment_max(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(scores: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                    indices_are_sorted: bool = False) -> jnp.ndarray:
    """Per-segment softmax over a flat score vector (dgl edge_softmax
    semantics: normalize scores over all entries sharing a segment id)."""
    seg_max = segment_max(scores, segment_ids, num_segments, indices_are_sorted)
    # empty segments produce -inf max; they have no entries so the gather
    # below never reads garbage for real entries.
    shifted = scores - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments, indices_are_sorted)
    return exp / denom[segment_ids]


def spmm(row: jnp.ndarray, col: jnp.ndarray, val: jnp.ndarray,
         dense: jnp.ndarray, num_rows: int,
         rows_are_sorted: bool = True) -> jnp.ndarray:
    """Sparse(COO) @ dense: out[r] = sum_{(r,c,v)} v * dense[c].

    Replaces torch_sparse.matmul for the GCN/HGCN paths
    (reference: Models/GnnLayers.py:37-41,148-151)."""
    msgs = val[:, None] * dense[col]
    return segment_sum(msgs, row, num_rows, indices_are_sorted=rows_are_sorted)


def hyperedge_gather(node_feats: jnp.ndarray, i3: jnp.ndarray) -> jnp.ndarray:
    """Hᵀ-side gather for fixed-degree-3 hyperedges: [E,3,d] endpoint rows."""
    return node_feats[i3]


def hyperedge_scatter(edge_feats: jnp.ndarray, inc_edge: jnp.ndarray,
                      inc_node: jnp.ndarray, node_count: int) -> jnp.ndarray:
    """H-side scatter: out[v] = sum over incidences (v, e) of edge_feats[e].

    ``inc_node`` must be sorted ascending with ``inc_edge`` the matching edge
    ids (graph.py packs them this way), making this a sequential sorted
    segment-sum. Replaces the SpMM H·E (Models/GnnLayers.py:233)."""
    return segment_sum(edge_feats[inc_edge], inc_node, node_count,
                       indices_are_sorted=True)
