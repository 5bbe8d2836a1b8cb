"""Word-bag mean embedding on the routed Pallas pipeline.

The query embedding is a masked mean over each query's word vectors
(``nn.EmbeddingBag(mode='mean')``, reference EmbeddingLayers.py:100-104).
Autodiff of the [Q, L] vocab gather is serial on TPU in BOTH directions:
the forward lowers to an XLA row gather (~15 ns/row; Q*L = 400k entries
at bench scale) and the backward to an XLA row scatter (~50 ns/row).

Structurally the bag IS a hypergraph role: "entries" (q, l) in
query-major order gather from sorted word ids — exactly the role-forward
(windowed expand + Clos stages), and the gradient scatter is exactly the
role backward (permute-to-t1 + CSR segment-sum with the final stage
absorbed into the ids). This module packs the word incidence through
ops/packing._role_pack and runs both directions on the same kernels as
the hyperedge aggregation:

  fwd: vocab_t --expand∘s0--> --T·p1·T·p2--> word values in (q, l) order
       --mask/count reduce--> [d, Q]
  bwd: cot [d, Q] --broadcast*weight--> (q, l) entries --T·p0, T·p1-->
       t1 order --CSR segment-sum (ids in t1 order)--> vocab grad

Everything data-dependent is host-packed once per dataset (``BagPack``,
attached to the graph structs by data/dataset.py) and enters the
custom-vjp function as an explicit pytree argument (CLAUDE.md: closures
bake constants into the HLO and leak tracers under remat).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ihgnn_tpu.ops.hyperagg import (_f0_tree, _kernels_active, _permute_to_t1,
                                    _role_forward)
from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t, pack_csr_tiles


@struct.dataclass
class BagPack:
    """Routed operands for the bag mean (host-packed once per dataset)."""
    rp: Any              # ops/packing.RolePack over the word incidence
    weight: Any          # [K_pad] f32 — mask/count per (q, l) entry
    ids2d: Any           # [K_pad/128, 128] int32 — sorted word table rows
    #                      in pre-p2 ("t1") order, sentinels on the tail
    tile_ptr: Any        # [T+1] int32
    # forward-side segment-sum operands (round 4): the fwd chain stops
    # BEFORE its final Clos stage and the weighted per-query mean runs as
    # a CSR segment-sum whose ids absorb fwd_p2 (query ids at fwd-t1
    # positions) — one stage pass and the [d, Q, L] reduce both fold into
    # the segsum. ``weight_t1`` carries the mask/count weights at the
    # same t1 positions.
    qids2d: Any = None   # [K_pad/128, 128] int32
    qtile_ptr: Any = None  # [Tq+1] int32
    weight_t1: Any = None  # [K_pad] f32
    bag_l: int = struct.field(pytree_node=False, default=0)
    k: int = struct.field(pytree_node=False, default=0)        # true Q*L
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    vocab_rows: int = struct.field(pytree_node=False, default=0)
    q_count: int = struct.field(pytree_node=False, default=0)

    @property
    def k_pad(self) -> int:
        return self.rows * self.cols


def make_bag_pack(query_words: np.ndarray, query_word_counts: np.ndarray,
                  vocab_rows: int) -> BagPack:
    """query_words: [Q, L] vocab TABLE rows (word idx + 1; 0 = pad),
    query_word_counts: [Q] true bag sizes, vocab_rows: logical table rows
    (vocab_size + 1)."""
    from concurrent.futures import ThreadPoolExecutor

    from ihgnn_tpu.ops.packing import _role_pack
    from ihgnn_tpu.ops.pallas.permute import pick_grid

    qw = np.asarray(query_words, np.int64)
    q, bag_l = qw.shape
    k = q * bag_l
    words = qw.reshape(-1)
    counts = np.maximum(np.asarray(query_word_counts, np.float64), 1.0)
    weight = ((words > 0).astype(np.float64)
              / np.repeat(counts, bag_l)).astype(np.float32)

    rows, cols = pick_grid(k, 1024)
    order = np.argsort(words, kind="stable")
    rank = np.empty(k, np.int64)
    rank[order] = np.arange(k)
    raw = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        rp, ids_t1, sorted_words = _role_pack(words, order, rank, rows, cols,
                                              pool, raw_out=raw)
    tile_ptr, _ = pack_csr_tiles(sorted_words.astype(np.int32), vocab_rows)

    k_pad = rows * cols
    weight_pad = np.zeros(k_pad, np.float32)
    weight_pad[:k] = weight

    # forward query-segsum layout: the fwd chain's final stage fwd_p2 is
    # absorbed by storing query ids (and weights) at PRE-p2 ("t1")
    # positions — the value at t1 (r, f2[r, c]) belongs to final (r, c),
    # whose query id is (r*C + c) // bag_l. Pads get sentinels (dropped).
    f2 = np.asarray(raw["f2"], np.int64)
    sent = 2**31 - 1
    qid_final = np.where(np.arange(k_pad) < k, np.arange(k_pad) // bag_l,
                         sent).astype(np.int64)
    qids_t1 = np.empty((rows, cols), np.int64)
    np.put_along_axis(qids_t1, f2, qid_final.reshape(rows, cols), axis=1)
    w_t1 = np.empty((rows, cols), np.float32)
    np.put_along_axis(w_t1, f2, weight_pad.reshape(rows, cols), axis=1)
    q = k // bag_l
    qtile_ptr, _ = pack_csr_tiles((np.arange(k) // bag_l).astype(np.int32),
                                  q)

    return BagPack(
        rp=rp,
        weight=jnp.asarray(weight_pad),
        ids2d=jnp.asarray(np.asarray(ids_t1).reshape(-1, 128)),
        tile_ptr=jnp.asarray(tile_ptr),
        qids2d=jnp.asarray(qids_t1.reshape(-1, 128).astype(np.int32)),
        qtile_ptr=jnp.asarray(qtile_ptr),
        weight_t1=jnp.asarray(w_t1.reshape(-1)),
        bag_l=bag_l, k=k, rows=rows, cols=cols, vocab_rows=vocab_rows,
        q_count=q,
    )


def _bag_fwd_impl(vocab_table_t, pack):
    # the table arrives FEATURE-MAJOR [d, rows] (models/embedding.py) —
    # exactly the layout the routed pipeline consumes; no transpose
    d, rows = vocab_table_t.shape
    bag_l = pack.bag_l
    q = pack.k // bag_l
    # routed path; the kernel-aware helpers fall back to jnp twins on CPU
    src_pad = pack.rp.gather.src_pad
    x_pad = jnp.pad(vocab_table_t, ((0, 0), (0, src_pad - rows)))
    if pack.qids2d is None:      # legacy pack: full chain + [d, Q, L] sum
        k_stream = _role_forward(x_pad, pack.rp, pack.rows, pack.cols)
        vals = (k_stream[:, :pack.k] * pack.weight[None, :pack.k]
                ).reshape(d, q, bag_l)
        return jnp.sum(vals, axis=2)                           # [d, Q]
    # round 4: stop the chain at t1 (pre-fwd_p2) and run the weighted
    # per-query mean as a CSR segment-sum whose ids absorb fwd_p2 — one
    # stage pass and the reduce fold into the segsum (VERDICT r3 item 7)
    from ihgnn_tpu.ops.hyperagg import _bt, _expand, _expand_t, _rlp_bt
    from ihgnn_tpu.ops.pallas.gather import EXP_RT, exp_t_vmem_ok
    ep = pack.rp.gather
    if (ep.idx.shape[0] == pack.rows and ep.idx.shape[1] * 128 == pack.cols
            and pack.rows % EXP_RT == 0
            and exp_t_vmem_ok(d, ep.w, x_pad.dtype)):
        t0 = _expand_t(x_pad, ep, pack.rows, pack.cols)
    else:
        t0 = _bt(_expand(x_pad, ep).reshape(d, pack.rows, pack.cols))
    t1 = _rlp_bt(t0, pack.rp.fwd_p1).reshape(d, pack.k_pad)
    vals = t1 * pack.weight_t1[None, :]
    if _kernels_active():
        return csr_segment_sum_t(vals, pack.qids2d, pack.qtile_ptr, q,
                                 out_transposed=True)
    ids = pack.qids2d.reshape(-1)
    valid = ids < q
    vals_m = jnp.where(valid[None, :], vals, 0).astype(jnp.float32)
    return jax.ops.segment_sum(vals_m.T, jnp.where(valid, ids, 0),
                               num_segments=q).T.astype(vals.dtype)


def _bag_grad_impl(cot, pack, table_rows):
    """Vocab-table gradient of the bag mean for one pack: cot [d, q] →
    feature-major [d, table_rows] (f32 accumulation, cast to cot dtype)."""
    d, q = cot.shape
    k, k_pad = pack.k, pack.k_pad
    # query-major expanded cotangent, weighted (mask/count)
    e = jnp.broadcast_to(cot[:, :, None], (d, q, pack.bag_l)).reshape(d, k)
    e = jnp.pad(e, ((0, 0), (0, k_pad - k))) * pack.weight[None, :]
    # query-major → t1 word order; stage 2 absorbed into the ids
    y2 = _permute_to_t1(e, pack.rp, pack.rows, pack.cols)
    if _kernels_active():
        grad_t = csr_segment_sum_t(y2, pack.ids2d, pack.tile_ptr,
                                   pack.vocab_rows, out_transposed=True)
    else:
        ids = pack.ids2d.reshape(-1)
        valid = ids < pack.vocab_rows
        vals = jnp.where(valid[None, :], y2, 0).astype(jnp.float32)
        grad_t = jax.ops.segment_sum(vals.T, jnp.where(valid, ids, 0),
                                     num_segments=pack.vocab_rows).T
    # the table may be row-padded past vocab_rows for even sharding
    return jnp.pad(grad_t, ((0, 0), (0, table_rows - pack.vocab_rows))
                   ).astype(cot.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bag_mean_single(vocab_table, query_words, inv_counts, pack, table_rows):
    """Feature-major bag-mean query embeddings [d, Q]. ``inv_counts`` and
    ``query_words`` are dataset structure (zero/float0 cotangents);
    ``table_rows`` is the (possibly shard-padded) table row count, static
    so the backward's row pad is shape-static."""
    return _bag_fwd_impl(vocab_table, pack)


def _bag_fwd(vocab_table, query_words, inv_counts, pack, table_rows):
    return (_bag_fwd_impl(vocab_table, pack),
            (query_words, inv_counts, pack))


def _bag_bwd(table_rows, res, cot):
    query_words, inv_counts, pack = res
    grad = _bag_grad_impl(cot, pack, table_rows)
    return (grad, np.zeros(query_words.shape, jax.dtypes.float0),
            jnp.zeros_like(inv_counts), _f0_tree(pack))


_bag_mean_single.defvjp(_bag_fwd, _bag_bwd)


# ---------------------------------------------------------------------------
# sharded bag (shard_map over the mesh data axis, per-query-slice packs)
# ---------------------------------------------------------------------------
#
# Same design as ops/hyperagg's sharded primitives: the custom VJP wraps
# the shard_map so autodiff never traverses the manual-mesh region. Each
# data shard owns a contiguous query range (queries pad to a multiple of
# the shard count with zero-weight dummy bags) and runs the full routed
# pipeline on its own BagPack; the vocab table enters replicated (GSPMD
# all-gathers it from the model-axis row sharding at the boundary) and
# the vocab gradient psums over the data axis.


@struct.dataclass
class ShardedBagPack:
    """Per-shard BagPacks stacked on a leading shard axis (data-sharded);
    static fields unified across shards. ``q`` is the true query count
    (the [d, q_pad] shard_map output is sliced back to it)."""
    pack: BagPack
    mesh: Any = struct.field(pytree_node=False, default=None)
    n_shards: int = struct.field(pytree_node=False, default=1)
    q: int = struct.field(pytree_node=False, default=0)
    q_pad: int = struct.field(pytree_node=False, default=0)


def make_sharded_bag_pack(query_words: np.ndarray,
                          query_word_counts: np.ndarray, vocab_rows: int,
                          n_shards: int, mesh: Any):
    """Per-shard packs over contiguous query slices, stacked for
    shard_map dispatch. Returns None when the per-shard grids or stage
    kinds disagree (cannot happen for equal slice sizes; defensive)."""
    qw = np.asarray(query_words)
    counts = np.asarray(query_word_counts)
    q = qw.shape[0]
    q_pad = -(-q // n_shards) * n_shards
    if q_pad != q:
        qw = np.concatenate(
            [qw, np.zeros((q_pad - q, qw.shape[1]), qw.dtype)])
        counts = np.concatenate([counts, np.ones(q_pad - q, counts.dtype)])
    qs = q_pad // n_shards
    try:
        packs = [make_bag_pack(qw[s * qs:(s + 1) * qs],
                               counts[s * qs:(s + 1) * qs], vocab_rows)
                 for s in range(n_shards)]
    except ValueError:       # banded-window cap exceeded: XLA fallback
        return None
    first = packs[0]
    if any((p.rows, p.cols, p.k, p.rp.fwd_p1.kind, p.rp.fwd_p2.kind,
            p.rp.bwd_p0.kind, p.rp.bwd_p1.kind) !=
           (first.rows, first.cols, first.k, first.rp.fwd_p1.kind,
            first.rp.fwd_p2.kind, first.rp.bwd_p0.kind,
            first.rp.bwd_p1.kind) for p in packs):
        return None

    from ihgnn_tpu.ops.packing import _with_expand_w
    w = max(p.rp.gather.w for p in packs)
    src_pad = max(max(p.rp.gather.src_pad for p in packs),
                  max(int(np.asarray(p.rp.gather.win).max()) + w
                      for p in packs))
    unified = [p.replace(rp=p.rp.replace(
        gather=_with_expand_w(p.rp.gather, w, src_pad))) for p in packs]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *unified)
    return ShardedBagPack(pack=stacked, mesh=mesh, n_shards=n_shards,
                          q=q, q_pad=q_pad)


def _sh_bag_specs(sbp):
    from jax.sharding import PartitionSpec as P

    from ihgnn_tpu.parallel.mesh import DATA_AXIS
    mesh = sbp.mesh
    return P, DATA_AXIS, mesh, mesh.devices.flat[0].platform


def _sh_bag_fwd_impl(vocab_table, sbp):
    from ihgnn_tpu.ops.hyperagg import _impl_platform
    P, data, mesh, plat = _sh_bag_specs(sbp)

    def body(table, pk_st):
        pk = jax.tree.map(lambda a: a[0], pk_st)
        return _bag_fwd_impl(table, pk)                    # [d, q_shard]

    with _impl_platform(plat):
        return jax.shard_map(body, mesh=mesh, in_specs=(P(), P(data)),
                             out_specs=P(None, data),
                             check_vma=False)(vocab_table, sbp.pack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bag_mean_sharded(vocab_table, sbp, table_rows):
    return _sh_bag_fwd_impl(vocab_table, sbp)


def _sh_bag_fwd(vocab_table, sbp, table_rows):
    return _sh_bag_fwd_impl(vocab_table, sbp), sbp


def _sh_bag_bwd(table_rows, sbp, cot):
    from ihgnn_tpu.ops.hyperagg import _impl_platform
    P, data, mesh, plat = _sh_bag_specs(sbp)

    def body(cot_loc, pk_st):
        pk = jax.tree.map(lambda a: a[0], pk_st)
        return jax.lax.psum(_bag_grad_impl(cot_loc, pk, table_rows), data)

    with _impl_platform(plat):
        grad = jax.shard_map(body, mesh=mesh,
                             in_specs=(P(None, data), P(data)),
                             out_specs=P(), check_vma=False)(cot, sbp.pack)
    return grad, _f0_tree(sbp)


_bag_mean_sharded.defvjp(_sh_bag_fwd, _sh_bag_bwd)


def bag_mean_t(vocab_table, query_words, inv_counts, pack, table_rows):
    """Feature-major bag-mean query embeddings [d, Q] — dispatches on the
    pack kind (single-chip BagPack vs mesh ShardedBagPack)."""
    if isinstance(pack, ShardedBagPack):
        return _bag_mean_sharded(vocab_table, pack, table_rows)[:, :pack.q]
    return _bag_mean_single(vocab_table, query_words, inv_counts, pack,
                            table_rows)
