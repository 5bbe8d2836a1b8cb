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
    bag_l: int = struct.field(pytree_node=False, default=0)
    k: int = struct.field(pytree_node=False, default=0)        # true Q*L
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    vocab_rows: int = struct.field(pytree_node=False, default=0)

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
    with ThreadPoolExecutor(max_workers=8) as pool:
        rp, ids_t1, sorted_words = _role_pack(words, order, rank, rows, cols,
                                              pool)
    tile_ptr, _ = pack_csr_tiles(sorted_words.astype(np.int32), vocab_rows)

    weight_pad = np.zeros(rows * cols, np.float32)
    weight_pad[:k] = weight
    return BagPack(
        rp=rp,
        weight=jnp.asarray(weight_pad),
        ids2d=jnp.asarray(np.asarray(ids_t1).reshape(-1, 128)),
        tile_ptr=jnp.asarray(tile_ptr),
        bag_l=bag_l, k=k, rows=rows, cols=cols, vocab_rows=vocab_rows,
    )


def _bag_fwd_impl(vocab_table, query_words, inv_counts, pack):
    d = vocab_table.shape[1]
    q, bag_l = query_words.shape
    # routed path; the kernel-aware helpers fall back to jnp twins on CPU
    src_pad = pack.rp.gather.src_pad
    x_pad = jnp.pad(vocab_table.T,
                    ((0, 0), (0, src_pad - vocab_table.shape[0])))
    k_stream = _role_forward(x_pad, pack.rp, pack.rows, pack.cols)
    vals = (k_stream[:, :pack.k] * pack.weight[None, :pack.k]
            ).reshape(d, q, bag_l)
    return jnp.sum(vals, axis=2)                               # [d, Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bag_mean_t(vocab_table, query_words, inv_counts, pack, table_rows):
    """Feature-major bag-mean query embeddings [d, Q]. ``inv_counts`` and
    ``query_words`` are dataset structure (zero/float0 cotangents);
    ``table_rows`` is the (possibly shard-padded) table row count, static
    so the backward's row pad is shape-static."""
    return _bag_fwd_impl(vocab_table, query_words, inv_counts, pack)


def _bag_fwd(vocab_table, query_words, inv_counts, pack, table_rows):
    return (_bag_fwd_impl(vocab_table, query_words, inv_counts, pack),
            (query_words, inv_counts, pack))


def _bag_bwd(table_rows, res, cot):
    query_words, inv_counts, pack = res
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
    grad = jnp.pad(grad_t.T, ((0, table_rows - pack.vocab_rows),
                              (0, 0))).astype(cot.dtype)
    return (grad, np.zeros(query_words.shape, jax.dtypes.float0),
            jnp.zeros_like(inv_counts), _f0_tree(pack))


bag_mean_t.defvjp(_bag_fwd, _bag_bwd)
