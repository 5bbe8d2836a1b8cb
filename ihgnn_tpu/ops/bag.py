"""Word-bag mean embedding with a routed backward.

The query embedding is a masked mean over each query's word vectors
(``nn.EmbeddingBag(mode='mean')``, reference EmbeddingLayers.py:100-104).
Autodiff of the [Q, L] table gather lowers its backward to an XLA row
scatter into the vocab table — serial on TPU (~50 ns/row; Q*L = 400k
entries at bench scale). This op keeps the forward as-is but routes the
backward through static machinery:

  cot [d, Q] → broadcast to query-major entries [d, Q*L] (* mask/count)
             → Clos-permute to word-sorted order (2 fused rlp+bt stages;
               the final stage is absorbed into the segment-sum ids,
               exactly like ops/packing.py's scatter regions)
             → Pallas CSR segment-sum → vocab-table gradient.

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

from ihgnn_tpu.ops.hyperagg import _f0_tree, _kernels_active, _rlp_bt
from ihgnn_tpu.ops.pallas.permute import StageTable, pick_grid
from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t, pack_csr_tiles


@struct.dataclass
class BagPack:
    """Routed operands for the bag-mean backward (host-packed once)."""
    weight: Any          # [K_pad] f32 — mask/count per query-major entry
    p0: StageTable       # [R, C]
    p1: StageTable       # [C, R]
    p2_ids2d: Any        # [K_pad/128, 128] int32 — word-sorted vocab rows,
    #                      stored in pre-p2 ("t1") order (stage-2 fusion)
    tile_ptr: Any        # [T+1] int32
    bag_l: int = struct.field(pytree_node=False, default=0)
    k: int = struct.field(pytree_node=False, default=0)        # true Q*L
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    vocab_rows: int = struct.field(pytree_node=False, default=0)


def make_bag_pack(query_words: np.ndarray, query_word_counts: np.ndarray,
                  vocab_rows: int) -> BagPack:
    """query_words: [Q, L] vocab TABLE rows (word idx + 1; 0 = pad),
    query_word_counts: [Q] true bag sizes, vocab_rows: table row count."""
    from ihgnn_tpu.ops.packing import _stage_table

    qw = np.asarray(query_words, np.int64)
    q, bag_l = qw.shape
    k = q * bag_l
    words = qw.reshape(-1)
    counts = np.maximum(np.asarray(query_word_counts, np.float64), 1.0)
    weight = ((words > 0).astype(np.float64)
              / np.repeat(counts, bag_l)).astype(np.float32)

    rows, cols = pick_grid(k, 1024)
    k_pad = rows * cols
    # out[j] = in[perm[j]]: word-sorted entry j takes query-major entry
    # perm[j]; identity tail past k (padded inputs are zeros)
    perm = np.concatenate([np.argsort(words, kind="stable"),
                           np.arange(k, k_pad, dtype=np.int64)])
    from ihgnn_tpu.ops import native
    routed = native.benes_route(perm, rows, cols)
    if routed is None:
        from ihgnn_tpu.ops.benes import benes_route_rect
        routed = benes_route_rect(perm, rows, cols)
    p0, p1, p2 = (np.asarray(p, np.int64) for p in routed)

    ids_sorted = np.concatenate([
        words[np.argsort(words, kind="stable")],
        np.full(k_pad - k, 2**31 - 1, np.int64)]).reshape(rows, cols)
    # stage-2 fusion: store ids at t1 positions — t1[r, p2[r, c]] carries
    # the value bound for sorted position (r, c) (segsum matches by id,
    # any within-block order is fine; p2 is row-local = block-local)
    ids_t1 = np.empty_like(ids_sorted)
    np.put_along_axis(ids_t1, p2, ids_sorted, axis=1)
    tile_ptr, _ = pack_csr_tiles(
        np.sort(words).astype(np.int32), vocab_rows)

    weight_pad = np.zeros(k_pad, np.float32)
    weight_pad[:k] = weight
    return BagPack(
        weight=jnp.asarray(weight_pad),
        p0=_stage_table(p0.astype(np.int32)),
        p1=_stage_table(p1.astype(np.int32)),
        p2_ids2d=jnp.asarray(ids_t1.reshape(-1, 128).astype(np.int32)),
        tile_ptr=jnp.asarray(tile_ptr),
        bag_l=bag_l, k=k, rows=rows, cols=cols, vocab_rows=vocab_rows,
    )


def _bag_fwd_impl(vocab_table, query_words, inv_counts):
    gathered = vocab_table[query_words]                    # [Q, L, d]
    mask = (query_words > 0).astype(gathered.dtype)
    summed = jnp.einsum("qld,ql->qd", gathered, mask)
    return (summed * inv_counts[:, None]).T                # [d, Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bag_mean_t(vocab_table, query_words, inv_counts, pack, table_rows):
    """Feature-major bag-mean query embeddings [d, Q]. ``inv_counts`` and
    ``query_words`` are dataset structure (zero/float0 cotangents);
    ``table_rows`` is the (possibly shard-padded) table row count, static
    so the backward's row pad is shape-static."""
    return _bag_fwd_impl(vocab_table, query_words, inv_counts)


def _bag_fwd(vocab_table, query_words, inv_counts, pack, table_rows):
    return (_bag_fwd_impl(vocab_table, query_words, inv_counts),
            (query_words, inv_counts, pack))


def _bag_bwd(table_rows, res, cot):
    query_words, inv_counts, pack = res
    d, q = cot.shape
    k, k_pad = pack.k, pack.rows * pack.cols
    # query-major expanded cotangent, weighted (mask/count)
    e = jnp.broadcast_to(cot[:, :, None], (d, q, pack.bag_l)).reshape(d, k)
    e = jnp.pad(e, ((0, 0), (0, k_pad - k))) * pack.weight[None, :]
    # Clos to word-sorted (t1) order: T·p0 then T·p1 fused pairs; stage 2
    # is absorbed into the segment-sum ids
    y1 = _rlp_bt(e.reshape(d, pack.rows, pack.cols), pack.p0)
    y2 = _rlp_bt(y1, pack.p1).reshape(d, k_pad)
    if _kernels_active():
        grad_t = csr_segment_sum_t(y2, pack.p2_ids2d, pack.tile_ptr,
                                   pack.vocab_rows, out_transposed=True)
    else:
        ids = pack.p2_ids2d.reshape(-1)
        valid = ids < pack.vocab_rows
        vals = jnp.where(valid[None, :], y2, 0).astype(jnp.float32)
        grad_t = jax.ops.segment_sum(vals.T, jnp.where(valid, ids, 0),
                                     num_segments=pack.vocab_rows).T
    # the table may be row-padded past vocab_rows for even sharding
    grad = jnp.pad(grad_t.T, ((0, table_rows - pack.vocab_rows),
                              (0, 0))).astype(cot.dtype)
    return (grad, np.zeros(query_words.shape, jax.dtypes.float0),
            jnp.zeros_like(inv_counts), _f0_tree(pack))


bag_mean_t.defvjp(_bag_fwd, _bag_bwd)
