"""Hyperedge aggregation ops with custom VJPs — Pallas fast path.

All APIs are **feature-major** ([d, N] node features, [d, E] edge
features): on TPU, arrays with a narrow (32-wide) minor dimension are
lane-padded to 128 — 4-5x wasted HBM and bandwidth — so the big N/E axis
must be the minor axis. The Pallas segment-sum kernel natively consumes and
produces this layout.

Primitives (SURVEY.md §2.3 kernel contract):

* ``gather_roles_t(x_t)``     — [d, N] → [d, 3E] endpoint features in
  role-major order ([u-cols | q-cols | i-cols]). Backward: sorted CSR
  segment-sum over the node-major incidence (Pallas).
* ``scatter_incidence_t(e_t)``— H·E: [d, E] → [d, N]. Backward: sum of the
  three role gathers of the cotangent.
* ``spmm_t(x_t)``             — symmetric 2D-adjacency SpMM [d, N] → [d, N].

Edges are numbered user-sorted (graph.py), so the node-major expansion
feeding the kernel is [identity | perm_q | perm_i] — 2E gathered columns
instead of 3E. Index arrays pass through the custom-vjp functions as
explicit arguments (float0 cotangents): closed-over traced arrays leak out
of ``jax.checkpoint``'s inner trace under remat, and baked-in numpy
constants overflow compile payload limits at stress scale.

Dispatch: Pallas when the graph carries packing arrays and the backend is
TPU; otherwise XLA segment ops (CPU tests, GSPMD-sharded meshes,
log-hypergraphs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.graph import Graph2D, HyperGraph
from ihgnn_tpu.ops import segment as xla_ops
from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t


def use_pallas(graph) -> bool:
    return (getattr(graph, "pk_tile_ptr", None) is not None
            and getattr(graph, "edge_mask", None) is None
            and jax.default_backend() == "tpu")


def strip_kernel_packing(graph):
    """Drop the pk_* packing arrays so every op dispatches to the XLA
    fallback — the ``--no_pallas`` / RuntimeConfig.use_pallas=False path."""
    pk_fields = [f for f in ("pk_inc_perm", "pk_inc_edge", "pk_ids2d",
                             "pk_tile_ptr", "pk_perm_q", "pk_perm_i",
                             "pk_col", "pk_val")
                 if getattr(graph, f, None) is not None]
    if not pk_fields:
        return graph
    return graph.replace(**{f: None for f in pk_fields})


def _f0(x):
    """float0 cotangent for an integer-dtype primal."""
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _segsum_regions_t(u_part, q_part, i_part, perm_q, perm_i, ids2d,
                      tile_ptr, n: int, pad: int):
    """Region parts are [d, E]; the node-major expansion is their
    concatenation (u-region = identity). Returns [d, n]."""
    parts = [u_part, q_part[:, perm_q], i_part[:, perm_i]]
    if pad:
        parts.append(jnp.zeros((u_part.shape[0], pad), u_part.dtype))
    expanded_t = jnp.concatenate(parts, axis=1)
    return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n,
                             out_transposed=True)


def _gather_split(x_t, i3_flat):
    """Per-role gathers: the u-role ids are sorted (edges are u-numbered),
    which the HBM access pattern rewards ~10x over a random gather."""
    e = i3_flat.shape[0] // 3
    return jnp.concatenate([x_t[:, i3_flat[:e]], x_t[:, i3_flat[e:2 * e]],
                            x_t[:, i3_flat[2 * e:]]], axis=1)


@jax.custom_vjp
def _gather_roles_t(x_t, i3_flat, perm_q, perm_i, ids2d, tile_ptr):
    return _gather_split(x_t, i3_flat)


def _gather_fwd(x_t, i3_flat, perm_q, perm_i, ids2d, tile_ptr):
    return _gather_split(x_t, i3_flat), (i3_flat, perm_q, perm_i, ids2d,
                                         tile_ptr, x_t.shape[1])


def _gather_bwd(res, cot):
    i3_flat, perm_q, perm_i, ids2d, tile_ptr, n = res
    e = i3_flat.shape[0] // 3
    grad = _segsum_regions_t(cot[:, :e], cot[:, e:2 * e], cot[:, 2 * e:],
                             perm_q, perm_i, ids2d, tile_ptr, n,
                             ids2d.size - 3 * e)
    return (grad, _f0(i3_flat), _f0(perm_q), _f0(perm_i), _f0(ids2d),
            _f0(tile_ptr))


_gather_roles_t.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _scatter_incidence_t(edge_t, i3_flat, perm_q, perm_i, ids2d, tile_ptr, n):
    return _segsum_regions_t(edge_t, edge_t, edge_t, perm_q, perm_i, ids2d,
                             tile_ptr, n, ids2d.size - 3 * edge_t.shape[1])


def _scatter_fwd(edge_t, i3_flat, perm_q, perm_i, ids2d, tile_ptr, n):
    out = _scatter_incidence_t(edge_t, i3_flat, perm_q, perm_i, ids2d,
                               tile_ptr, n)
    return out, (i3_flat, perm_q, perm_i, ids2d, tile_ptr)


def _scatter_bwd(n, res, cot):
    i3_flat, perm_q, perm_i, ids2d, tile_ptr = res
    e = i3_flat.shape[0] // 3
    # per-role gathers: the u-role gather is monotone (fast path)
    grad = (cot[:, i3_flat[:e]] + cot[:, i3_flat[e:2 * e]]
            + cot[:, i3_flat[2 * e:]])
    return (grad, _f0(i3_flat), _f0(perm_q), _f0(perm_i), _f0(ids2d),
            _f0(tile_ptr))


_scatter_incidence_t.defvjp(_scatter_fwd, _scatter_bwd)


def role_major_i3(graph: HyperGraph) -> jnp.ndarray:
    """[3E] flat endpoint ids in role-major order [u... | q... | i...].
    Trace-safe: the graph may enter through jit arguments."""
    i3 = graph.i3
    return jnp.concatenate([i3[:, 0], i3[:, 1], i3[:, 2]])


def make_hyper_ops(graph: HyperGraph):
    """Returns (gather_roles_t, scatter_incidence_t) bound to one graph's
    static packing. Both operate feature-major."""
    n = graph.node_count
    i3_flat = role_major_i3(graph)

    if not use_pallas(graph):
        def gather_roles_t(x_t):
            return _gather_split(x_t, i3_flat)

        def scatter_incidence_t(edge_t):
            out = xla_ops.hyperedge_scatter(edge_t.T, graph.inc_edge,
                                            graph.inc_node, n)
            return out.T

        return gather_roles_t, scatter_incidence_t

    perm_q, perm_i = graph.pk_perm_q, graph.pk_perm_i
    ids2d, tile_ptr = graph.pk_ids2d, graph.pk_tile_ptr

    def gather_roles_t(x_t):
        return _gather_roles_t(x_t, i3_flat, perm_q, perm_i, ids2d, tile_ptr)

    def scatter_incidence_t(edge_t):
        return _scatter_incidence_t(edge_t, i3_flat, perm_q, perm_i, ids2d,
                                    tile_ptr, n)

    return gather_roles_t, scatter_incidence_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n):
    expanded_t = x_t[:, col] * val[None, :]
    return csr_segment_sum_t(expanded_t, ids2d, tile_ptr, n,
                             out_transposed=True)


def _spmm_fwd(x_t, col, val, ids2d, tile_ptr, n):
    return _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n), (col, val, ids2d,
                                                            tile_ptr,
                                                            x_t.shape[1])


def _spmm_bwd(n_out, res, cot):
    col, val, ids2d, tile_ptr, n_in = res
    # the 2D adjacency is symmetric in structure and values, so Aᵀ = A
    grad = _spmm_sym_t(cot, col, val, ids2d, tile_ptr, n_in)
    return (grad, _f0(col), jnp.zeros_like(val), _f0(ids2d), _f0(tile_ptr))


# ``val`` is treated as graph STRUCTURE, not a learnable weight: its
# cotangent is defined as zero (it cannot be in nondiff_argnums — those are
# baked static, and val is a runtime array). If edge values ever become
# trainable, _spmm_bwd must also return cot·x contractions per entry.
_spmm_sym_t.defvjp(_spmm_fwd, _spmm_bwd)


def make_spmm_op(graph: Graph2D):
    """Symmetric-adjacency SpMM (feature-major): x_t [d, N] ↦ (A @ xᵀ)ᵀ.

    All 2D graph constructions are symmetric in structure and values
    (Helpers/Graph.py:40-63), so the VJP is the same SpMM of the
    cotangent."""
    n = graph.node_count

    if not use_pallas(graph):
        def spmm_t(x_t):
            return xla_ops.spmm(graph.row, graph.col, graph.val, x_t.T, n).T
        return spmm_t

    col, val = graph.pk_col, graph.pk_val
    ids2d, tile_ptr = graph.pk_ids2d, graph.pk_tile_ptr

    def spmm_t(x_t):
        return _spmm_sym_t(x_t, col, val, ids2d, tile_ptr, n)

    return spmm_t
