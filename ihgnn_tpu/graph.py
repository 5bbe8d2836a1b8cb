"""Graph packing: search-log interactions → frozen, sorted index arrays.

TPU-first re-design of the reference graph builders (Helpers/Graph.py).
Instead of device-resident ``torch.sparse_coo_tensor`` objects, graphs are
immutable pytrees of pre-sorted NumPy/JAX arrays, laid out so every
aggregation in the model is a *sorted segment-sum* (sequential, no atomics —
the only scatter pattern TPUs run fast):

* ``HyperGraph`` — one hyperedge per positive (u,q,i) interaction
  (reference: Helpers/Graph.py:84-134). ``i3`` is the [E,3] endpoint array
  (global node ids); the node-major incidence (``inc_node``/``inc_edge``,
  sorted by node) drives the scatter side H·E of the convolution.
* ``Graph2D`` — the bipartite/tripartite 2D graph with selectable
  completeness uqi/uq/ui/qi (reference: Helpers/Graph.py:12-81). COO entries
  are coalesced (duplicates summed) and sorted by (row, col); ``dst_order``
  re-sorts entries by destination for GAT's per-destination softmax.
* ``LogHyperGraph`` — one hyperedge per whole search log = {u, q, positive
  items}, ragged edge degree (reference: Helpers/Graph.py:138-189).

Node index space is [users | queries | items]: query ids are offset by
user_count and item ids by user_count+query_count (Helpers/Graph.py:38-39).
Zero-degree vertices get degree 1e-8 (Helpers/Graph.py:68,120,175).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np
from flax import struct

from ihgnn_tpu.config import V

DEGREE_FLOOR = 1e-8


@struct.dataclass
class HyperGraph:
    """Hypergraph with fixed edge degree 3 (one edge per uqi interaction)."""

    i3: np.ndarray        # [E, 3] int32 — (u, q, i) global node ids per edge
    dv: np.ndarray        # [N, 1] f32 — vertex degrees (floored)
    inc_node: np.ndarray  # [3E] int32 — node ids, sorted ascending
    inc_edge: np.ndarray  # [3E] int32 — edge id of each incidence entry
    # [E, 1] f32 zero/one mask over edges, or None when all edges are real;
    # used when the edge axis is padded for even sharding
    edge_mask: object = None
    # Pallas kernel pack (ops/packing.HyperKernelPack): windowed role
    # expansions, Clos permutation stages, and the node-major CSR
    # segment-sum operands. None → XLA fallback ops.
    kp: object = None
    # Sharded kernel packing (ops/packing.ShardedHyperPack): per-edge-shard
    # packs stacked for shard_map dispatch on a device mesh. Attached by
    # parallel/sharding.pad_hypergraph_for_mesh.
    skp: object = None
    # Routed word-bag backward pack (ops/bag.BagPack); None → plain
    # autodiff of the vocab gather (XLA scatter backward).
    bag: object = None
    node_count: int = struct.field(pytree_node=False, default=0)
    edge_count: int = struct.field(pytree_node=False, default=0)

    @property
    def edge_degrees(self) -> np.ndarray:
        return np.full((self.edge_count, 1), 3.0, np.float32)


@struct.dataclass
class Graph2D:
    """Coalesced symmetric 2D graph in sorted-COO form."""

    row: np.ndarray        # [nnz] int32, sorted (lexicographic with col)
    col: np.ndarray        # [nnz] int32
    val: np.ndarray        # [nnz] f32 — summed duplicate multiplicities
    dv: np.ndarray         # [N, 1] f32
    dst_order: np.ndarray  # [nnz] int32 — permutation sorting entries by col
    # Pallas SpMM packing (row-major CSR tiles); None when not packed.
    pk_col: object = None       # [nnz_pad] int32 — col per entry, 0-padded
    pk_val: object = None       # [nnz_pad] f32 — value per entry, 0-padded
    pk_ids2d: object = None     # [nnz_pad/128, 128] int32 — sorted row ids
    pk_tile_ptr: object = None  # [T+1] int32
    # Routed col-gather pack (ops/packing.RolePack, fwd stages only): the
    # SpMM expansion x[:, col] runs windowed-expand + Clos instead of an
    # XLA row gather. When set, pk_val/pk_ids2d are sized rows*cols.
    pk_role: object = None
    # Routed GAT attention pack (ops/gatconv.GatPack) over the dst-sorted
    # entry list; None when unpacked (XLA row-major _GatCore fallback).
    gat_pk: object = None
    # Routed word-bag backward pack (ops/bag.BagPack); see HyperGraph.
    bag: object = None
    node_count: int = struct.field(pytree_node=False, default=0)
    nnz: int = struct.field(pytree_node=False, default=0)
    pk_rows: int = struct.field(pytree_node=False, default=0)
    pk_cols: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class LogHyperGraph:
    """Ragged hypergraph: one edge per search log with >=1 positive item."""

    inc_node: np.ndarray       # [nnz] int32 — node ids, node-major sorted
    inc_edge: np.ndarray       # [nnz] int32 — matching edge ids
    edge_nodes: np.ndarray     # [nnz] int32 — node ids, edge-major sorted
    edge_ids: np.ndarray       # [nnz] int32 — sorted edge ids (edge-major)
    dv: np.ndarray             # [N, 1] f32
    de: np.ndarray             # [E, 1] f32 — edge degrees
    node_count: int = struct.field(pytree_node=False)
    edge_count: int = struct.field(pytree_node=False)


def _global_ids(u: np.ndarray, q: np.ndarray, i: np.ndarray,
                user_count: int, query_count: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (u.astype(np.int64),
            q.astype(np.int64) + user_count,
            i.astype(np.int64) + user_count + query_count)


def build_hypergraph(uqi: np.ndarray, node_count: int, user_count: int,
                     query_count: int, pack_kernels: bool = True) -> HyperGraph:
    """Pack positive interactions [P, >=3] of (u, q, i[, flag]) columns into a
    ``HyperGraph``. Interactions with flag<=0 must be filtered by the caller
    (the dataset layer only materializes positives)."""
    uqi = np.asarray(uqi)
    u, q, i = _global_ids(uqi[:, 0], uqi[:, 1], uqi[:, 2], user_count, query_count)
    e_count = len(u)

    # number edges in user-sorted order: the u-region of the node-major
    # incidence is then the identity expansion, and the node-major entry
    # order is exactly [u-region | q-rank order | i-rank order] (node ids
    # are grouped [users | queries | items])
    edge_order = np.argsort(u, kind="stable")
    u, q, i = u[edge_order], q[edge_order], i[edge_order]

    i3 = np.stack([u, q, i], axis=1).astype(np.int32)

    dv = np.zeros(node_count, np.float32)
    np.add.at(dv, i3.reshape(-1).astype(np.int64), 1.0)
    dv[dv == 0] = DEGREE_FLOOR

    flat_nodes = i3.reshape(-1).astype(np.int64)
    flat_edges = np.repeat(np.arange(e_count, dtype=np.int64), 3)
    order = np.argsort(flat_nodes, kind="stable")
    sorted_nodes = flat_nodes[order].astype(np.int32)

    kp = None
    if pack_kernels and e_count:
        from ihgnn_tpu.ops.packing import build_hyper_kernel_pack
        kp = build_hyper_kernel_pack(i3, node_count)

    return HyperGraph(
        i3=i3,
        dv=dv.reshape(-1, 1),
        inc_node=sorted_nodes,
        inc_edge=flat_edges[order].astype(np.int32),
        kp=kp,
        node_count=int(node_count),
        edge_count=int(e_count),
    )


def build_graph2d(uqif: np.ndarray, node_count: int, user_count: int,
                  query_count: int, completeness: str = V.GRAPH_UQI,
                  use_self_connection: bool = False) -> Graph2D:
    """Pack positive interactions [P, 4] of (u, q, i, flag) into the 2D graph.

    Mirrors Helpers/Graph.py:19-81: per interaction, symmetric edge pairs are
    appended by completeness mode; COO duplicates are *summed* (torch
    ``coalesce`` semantics), so repeated (u,q) pairs yield values > 1. Vertex
    degrees count incidences (2 per interaction in uqi mode, 1 otherwise).
    """
    uqif = np.asarray(uqif)
    u, q, i = _global_ids(uqif[:, 0], uqif[:, 1], uqif[:, 2], user_count, query_count)
    flag = uqif[:, 3].astype(np.float32) if uqif.shape[1] > 3 else np.ones(len(u), np.float32)
    ones = np.ones_like(flag)

    if completeness == V.GRAPH_UQI:
        # u-q, q-i, i-u and mirrors; i-u edges carry the flag value
        rows = np.concatenate([u, q, i, i, q, u])
        cols = np.concatenate([q, i, u, q, u, i])
        vals = np.concatenate([ones, ones, flag, ones, ones, flag])
        deg_nodes = np.concatenate([u, q, i])
        deg_inc = 2.0
    elif completeness == V.GRAPH_ONLY_UQ:
        rows, cols = np.concatenate([u, q]), np.concatenate([q, u])
        vals = np.concatenate([ones, ones])
        deg_nodes, deg_inc = np.concatenate([u, q]), 1.0
    elif completeness == V.GRAPH_ONLY_UI:
        rows, cols = np.concatenate([u, i]), np.concatenate([i, u])
        vals = np.concatenate([ones, ones])
        deg_nodes, deg_inc = np.concatenate([u, i]), 1.0
    elif completeness == V.GRAPH_ONLY_QI:
        rows, cols = np.concatenate([q, i]), np.concatenate([i, q])
        vals = np.concatenate([ones, ones])
        deg_nodes, deg_inc = np.concatenate([q, i]), 1.0
    else:
        raise ValueError(f"unknown graph completeness {completeness!r}")

    dv = np.zeros(node_count, np.float32)
    if use_self_connection:
        rows = np.concatenate([rows, np.arange(node_count)])
        cols = np.concatenate([cols, np.arange(node_count)])
        vals = np.concatenate([vals, np.ones(node_count, np.float32)])
        dv += 1.0
    np.add.at(dv, deg_nodes, deg_inc)
    if not use_self_connection:
        dv[dv == 0] = DEGREE_FLOOR

    # coalesce: sum duplicates, sort by (row, col)
    keys = rows * node_count + cols
    uniq, inverse = np.unique(keys, return_inverse=True)
    val_sum = np.zeros(len(uniq), np.float32)
    np.add.at(val_sum, inverse, vals)
    crow = (uniq // node_count).astype(np.int32)
    ccol = (uniq % node_count).astype(np.int32)

    dst_order = np.argsort(ccol, kind="stable").astype(np.int32)

    # Pallas SpMM packing over the row-sorted entries
    from ihgnn_tpu.ops.pallas.segsum import BLOCK, pack_csr_tiles
    nnz = len(uniq)
    tile_ptr, _ = pack_csr_tiles(crow, node_count)

    # routed col-gather pack: the expansion x[:, col] is a role-forward
    # over sorted cols (ops/packing._role_pack, fwd stages only — the
    # adjacency is symmetric so the backward reuses the same op). Falls
    # back to the XLA col gather when windows exceed W_CAP.
    pk_role = None
    rows_g = cols_g = 0
    try:
        from concurrent.futures import ThreadPoolExecutor

        from ihgnn_tpu.ops.packing import _role_pack
        from ihgnn_tpu.ops.pallas.permute import pick_grid
        if nnz:
            # c=2048 keeps the [R, C]-orientation rows hier-eligible
            # (b=16) at 2D-graph scale (nnz ~6x the interaction count) and
            # halves the [C, R] flat-stage depth vs c=1024 — total stage
            # mask work ∝ 2C + R is near its minimum here
            rows_g, cols_g = pick_grid(nnz, 2048)
            order = np.argsort(ccol, kind="stable").astype(np.int64)
            rank = np.empty(nnz, np.int64)
            rank[order] = np.arange(nnz)
            with ThreadPoolExecutor(max_workers=8) as pool:
                pk_role, _, _ = _role_pack(ccol.astype(np.int64), order,
                                           rank, rows_g, cols_g, pool,
                                           with_bwd=False)
    except ValueError:
        pk_role, rows_g, cols_g = None, 0, 0

    nnz_pad = rows_g * cols_g if pk_role is not None else (
        -(-max(nnz, 1) // BLOCK) * BLOCK)
    pad = nnz_pad - nnz
    ids_pad = np.concatenate([crow, np.full(pad, 2**31 - 1, np.int32)])

    # routed GAT attention pack over the dst-sorted entries (round 5 —
    # replaces the row-major XLA hot path, docs/GAT_PROBE.json). Same
    # fallback regime as pk_role; skippable for probes via IHGNN_GAT_PACK=0
    gat_pk = None
    if pk_role is not None and os.environ.get("IHGNN_GAT_PACK", "1") == "1":
        try:
            from ihgnn_tpu.ops.gatconv import build_gat_pack
            gat_pk = build_gat_pack(
                crow[dst_order], ccol[dst_order], node_count,
                live=val_sum[dst_order],
                src_cuts=(user_count, user_count + query_count))
        except ValueError:
            gat_pk = None

    return Graph2D(
        row=crow, col=ccol, val=val_sum,
        dv=dv.reshape(-1, 1).astype(np.float32),
        dst_order=dst_order,
        pk_col=np.concatenate([ccol, np.zeros(pad, np.int32)]),
        pk_val=np.concatenate([val_sum, np.zeros(pad, np.float32)]),
        pk_ids2d=ids_pad.reshape(-1, 128),
        pk_tile_ptr=tile_ptr,
        pk_role=pk_role,
        gat_pk=gat_pk,
        node_count=int(node_count),
        nnz=int(nnz),
        pk_rows=int(rows_g), pk_cols=int(cols_g),
    )


def build_log_hypergraph(log_nodes: Sequence[Sequence[int]],
                         node_count: int) -> LogHyperGraph:
    """Pack per-log node lists (already offset to global ids, each list =
    {u, q, positive items}; lists with only {u, q} must be dropped by the
    caller) into a ragged ``LogHyperGraph`` (Helpers/Graph.py:148-189)."""
    edge_ids, flat_nodes, de = [], [], []
    for e, nodes in enumerate(log_nodes):
        flat_nodes.extend(nodes)
        edge_ids.extend([e] * len(nodes))
        de.append(len(nodes))
    e_count = len(de)
    flat_nodes = np.asarray(flat_nodes, np.int64)
    edge_ids = np.asarray(edge_ids, np.int64)

    dv = np.zeros(node_count, np.float32)
    np.add.at(dv, flat_nodes, 1.0)
    dv[dv == 0] = DEGREE_FLOOR

    node_order = np.argsort(flat_nodes, kind="stable")

    return LogHyperGraph(
        inc_node=flat_nodes[node_order].astype(np.int32),
        inc_edge=edge_ids[node_order].astype(np.int32),
        edge_nodes=flat_nodes.astype(np.int32),
        edge_ids=edge_ids.astype(np.int32),
        dv=dv.reshape(-1, 1),
        de=np.asarray(de, np.float32).reshape(-1, 1),
        node_count=int(node_count),
        edge_count=int(e_count),
    )
