"""Sharding rules: which axis of which array lives on which mesh axis.

Placement plan (GSPMD inserts the collectives):

* embedding tables (``*_table`` params) — rows sharded over ``model``;
  endpoint/word gathers lower to all-to-all over ICI, gradient scatter-adds
  go back the same way. Tables are row-padded to a multiple of the model
  axis size (models/embedding.py ``row_multiple``).
* hyperedge arrays (``i3``, incidence pairs) and training batches — sharded
  over ``data``; per-shard segment-sums combine with psum/reduce-scatter.
* dense tower params, degree vectors, query word matrix — replicated.

Single-chip (1x1 mesh) degenerates to fully-replicated placement with the
same code path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ihgnn_tpu.graph import Graph2D, HyperGraph, LogHyperGraph
from ihgnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

TABLE_PARAM_NAMES = ("user_table", "item_table", "vocab_table")
# srrl's KG/PS tables are row-major [rows, d] (their hot path is small
# row gathers); the main EmbeddingTables are feature-major [d, rows]
# (models/embedding.py) — rows shard over 'model' in both layouts.
_ROWMAJOR_MODULES = ("KG", "PS")


def _table_axes():
    """Mesh axes the table ROWS shard over. Default: 'model' only. The
    100M-edge deployment (docs/PARALLELISM.md) runs mesh data=8 x model=1
    and needs the 13.4 GB of table+Adam state split over all 8 chips —
    IHGNN_TABLE_SHARD_BOTH=1 shards rows over (model, data) combined
    (row count must pad to data*model; models/embedding.py
    ``row_multiple``). Lookups then all-to-all over both axes."""
    import os
    if os.environ.get("IHGNN_TABLE_SHARD_BOTH", "0") == "1":
        return (MODEL_AXIS, DATA_AXIS)
    return MODEL_AXIS


def _table_spec(keys, leaf):
    """PartitionSpec for a table leaf: shard the rows axis (_table_axes)."""
    ndim = getattr(leaf, "ndim", 0)
    axes = _table_axes()
    if any(k in _ROWMAJOR_MODULES for k in keys):
        return P(axes, *([None] * (ndim - 1)))
    return P(*([None] * (ndim - 1)), axes)


def put_global(x, sharding: NamedSharding):
    """``device_put`` onto a (possibly multi-process) global mesh.

    Single-process: plain ``jax.device_put``. Multi-process: every process
    passes the SAME global value (host replicas are kept identical — the
    sampler and graph builders are seed-deterministic), and each process
    places only its addressable shards, assembled into a global array with
    ``make_array_from_single_device_arrays``. A plain device_put would
    raise on non-addressable devices (VERDICT round-1 item 3).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    arrs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)


def put_global_tree(tree, sharding_tree):
    return jax.tree.map(put_global, tree, sharding_tree)


def _param_spec_tree(params: Any) -> Any:
    """PartitionSpec tree matching a param pytree: tables row-sharded on
    'model', everything else replicated."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if any(k in TABLE_PARAM_NAMES for k in keys) and getattr(leaf, "ndim", 0) >= 1:
            specs.append(_table_spec(keys, leaf))
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(flat[1], specs)


def state_sharding(state, mesh: Mesh):
    """NamedSharding tree for a TrainState (params + mirrored adam moments)."""
    def to_sharding(spec_tree):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                            is_leaf=lambda x: isinstance(x, P))

    param_specs = _param_spec_tree(state.params)
    # opt_state: scale_by_adam's mu/nu mirror the param tree structure;
    # replicate any non-mirroring leaves (counts etc.)
    def opt_spec(leaf_path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in leaf_path]
        if any(k in TABLE_PARAM_NAMES for k in keys) and getattr(leaf, "ndim", 0) >= 1:
            return _table_spec(keys, leaf)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(state.opt_state)
    opt_specs = jax.tree_util.tree_unflatten(
        flat[1], [opt_spec(p, l) for p, l in flat[0]])

    return dataclasses.replace(
        state,
        params=to_sharding(param_specs),
        opt_state=to_sharding(opt_specs),
        step=NamedSharding(mesh, P()),
        lr=NamedSharding(mesh, P()),
    )


def shard_state(state, mesh: Mesh):
    return put_global_tree(state, state_sharding(state, mesh))


def _bag_sharding(bag, mesh: Mesh, rep):
    """Sharding spec tree for a word-bag pack: per-shard stacked packs
    (ops/bag.ShardedBagPack) shard their leading axis over 'data';
    single-chip BagPacks replicate."""
    if bag is None:
        return None
    from ihgnn_tpu.ops.bag import ShardedBagPack
    if isinstance(bag, ShardedBagPack):
        shard0 = NamedSharding(mesh, P(DATA_AXIS))
        return jax.tree.map(lambda _: shard0, bag)
    return jax.tree.map(lambda _: rep, bag)


def graph_sharding(graph, mesh: Mesh):
    """NamedSharding tree for a packed graph: edge-indexed arrays over
    'data', per-node arrays replicated."""
    rep = NamedSharding(mesh, P())
    edge = NamedSharding(mesh, P(DATA_AXIS))
    edge2d = NamedSharding(mesh, P(DATA_AXIS, None))
    if isinstance(graph, HyperGraph):
        mask = None if graph.edge_mask is None else edge2d
        kp = (None if graph.kp is None
              else jax.tree.map(lambda _: rep, graph.kp))
        # stacked per-shard packs: leading shard axis over 'data'
        skp = None
        if graph.skp is not None:
            shard0 = NamedSharding(mesh, P(DATA_AXIS))
            skp = jax.tree.map(lambda _: shard0, graph.skp)
        bag = _bag_sharding(graph.bag, mesh, rep)
        return graph.replace(i3=edge2d, dv=rep, inc_node=edge, inc_edge=edge,
                             edge_mask=mask, kp=kp, skp=skp, bag=bag)
    if isinstance(graph, Graph2D):
        pk = {f: (None if getattr(graph, f) is None else rep)
              for f in ("pk_col", "pk_val", "pk_ids2d", "pk_tile_ptr")}
        pk_role = (None if graph.pk_role is None
                   else jax.tree.map(lambda _: rep, graph.pk_role))
        gat_pk = (None if graph.gat_pk is None
                  else jax.tree.map(lambda _: rep, graph.gat_pk))
        bag = _bag_sharding(graph.bag, mesh, rep)
        return graph.replace(row=edge, col=edge, val=edge, dv=rep,
                             dst_order=edge, pk_role=pk_role, gat_pk=gat_pk,
                             bag=bag, **pk)
    if isinstance(graph, LogHyperGraph):
        return graph.replace(inc_node=edge, inc_edge=edge, edge_nodes=edge,
                             edge_ids=edge, dv=rep, de=rep)
    raise TypeError(type(graph))


def shard_graph(graph, mesh: Mesh):
    return put_global_tree(graph, graph_sharding(graph, mesh))


def batch_sharding(batch, mesh: Mesh):
    # rows shard over 'data'; for grad-accum stacks [k, R] the stack axis
    # stays replicated and the row axis shards
    def spec(leaf):
        nd = getattr(leaf, "ndim", 1)
        return NamedSharding(mesh, P(*([None] * (nd - 1) + [DATA_AXIS])))
    return jax.tree.map(spec, batch)


def shard_batch(batch, mesh: Mesh):
    return put_global_tree(batch, batch_sharding(batch, mesh))


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_graph2d_for_mesh(graph: Graph2D, data_parallel: int,
                         mesh: Mesh = None, pack_kernels: bool = None,
                         bag_inputs=None) -> Graph2D:
    """Pad the COO entry count to a multiple of the data axis with zero-value
    entries at the last node (keeps row-sorting; contributes nothing).
    Single-chip kernel packs are stripped either way — a naked pallas_call
    must not execute over GSPMD-sharded operands (the sharded 2D path runs
    the XLA ops, which GSPMD partitions along the entry axis) — and the
    word-bag pack is rebuilt per shard when ``mesh``/``bag_inputs`` are
    given (shard_map dispatch survives the mesh)."""
    if pack_kernels is None:
        pack_kernels = jax.default_backend() == "tpu"
    bag = (_sharded_bag(bag_inputs, data_parallel, mesh, pack_kernels)
           if mesh is not None else None)
    nnz = graph.nnz
    nnz_pad = round_up(max(nnz, 1), data_parallel)
    if nnz_pad == nnz:
        from ihgnn_tpu.ops.hyperagg import strip_kernel_packing
        return strip_kernel_packing(graph).replace(bag=bag)
    extra = nnz_pad - nnz
    last = graph.node_count - 1
    return Graph2D(
        row=np.concatenate([graph.row, np.full(extra, last, np.int32)]),
        col=np.concatenate([graph.col, np.full(extra, last, np.int32)]),
        val=np.concatenate([graph.val, np.zeros(extra, np.float32)]),
        dv=graph.dv,
        dst_order=np.concatenate([graph.dst_order,
                                  np.arange(nnz, nnz_pad, dtype=np.int32)]),
        node_count=graph.node_count,
        nnz=int(nnz_pad),
        bag=bag,
    )


def _sharded_bag(bag_inputs, data_parallel: int, mesh: Mesh,
                 pack_kernels: bool):
    """Build the shard_map word-bag pack (ops/bag.ShardedBagPack) from
    ``bag_inputs = (query_words, query_word_counts, vocab_rows)``; None
    when inputs are absent or kernels are off (the bag then falls back to
    plain autodiff through the GSPMD-partitioned XLA gather)."""
    if bag_inputs is None or not pack_kernels:
        return None
    from ihgnn_tpu.ops.bag import make_sharded_bag_pack
    query_words, counts, vocab_rows = bag_inputs
    return make_sharded_bag_pack(query_words, counts, vocab_rows,
                                 max(1, data_parallel), mesh)


def pad_hypergraph_for_mesh(graph: HyperGraph, data_parallel: int,
                            mesh: Mesh = None,
                            pack_kernels: bool = None,
                            bag_inputs=None) -> HyperGraph:
    """Pad edge count to a multiple of the data axis so edge arrays shard
    evenly, and (when a mesh is given) build the per-shard Pallas kernel
    packs (ops/packing.ShardedHyperPack) so the fast path survives
    sharding.

    Padded i3 rows repeat the last real edge (keeps the edge axis
    u-sorted — required by the per-shard packs); their features are zeroed
    via ``edge_mask`` in the layers, so where they point is immaterial.
    Padded incidence entries target the max node id with padded-edge ids
    (keeps node-major sortedness for the XLA path).

    ``pack_kernels``: None = auto (pack when the default backend is TPU —
    Mosaic kernels don't compile on CPU outside interpreter mode).
    """
    e = graph.edge_count
    e_pad = round_up(max(e, 1), data_parallel)
    n_extra = e_pad - e
    if n_extra:
        i3 = np.concatenate(
            [np.asarray(graph.i3),
             np.repeat(np.asarray(graph.i3[-1:]), n_extra, axis=0)], axis=0)
        last_node = graph.node_count - 1
        inc_node = np.concatenate([graph.inc_node,
                                   np.full(3 * n_extra, last_node, np.int32)])
        inc_edge = np.concatenate(
            [graph.inc_edge,
             np.repeat(np.arange(e, e_pad, dtype=np.int32), 3)])
        mask = np.zeros((e_pad, 1), np.float32)
        mask[:e] = 1.0
        graph = HyperGraph(i3=i3.astype(np.int32), dv=graph.dv,
                           inc_node=inc_node, inc_edge=inc_edge,
                           edge_mask=mask, node_count=graph.node_count,
                           edge_count=int(e_pad), bag=graph.bag)
    if pack_kernels is None:
        pack_kernels = jax.default_backend() == "tpu"
    if mesh is not None:
        skp = None
        if pack_kernels:
            from ihgnn_tpu.ops.packing import build_sharded_hyper_pack
            skp = build_sharded_hyper_pack(
                np.asarray(graph.i3), graph.node_count,
                max(1, data_parallel), mesh)
        # the unsharded single-chip packs cannot run under a mesh (a bare
        # pallas_call is not GSPMD-partitionable) — drop them either way
        # and rebuild the word-bag pack per shard
        graph = graph.replace(
            skp=skp, kp=None,
            bag=_sharded_bag(bag_inputs, data_parallel, mesh, pack_kernels))
    return graph
