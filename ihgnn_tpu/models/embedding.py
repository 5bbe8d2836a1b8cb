"""Entity embedding tables: users, items, query word-bags.

Re-designs Models/EmbeddingLayers.py for TPU:

* user/item tables have num+1 rows with row 0 reserved for padding
  (Dataset.py:149-155); entity index i maps to row i+1. Row 0 is zeroed,
  matching torch ``padding_idx=0``.
* query embedding = mean over the query's word embeddings
  (``nn.EmbeddingBag(mode='mean')``, EmbeddingLayers.py:100-104), computed
  as a masked padded gather-mean (ragged bags pre-padded by the dataset).
* optional post-transform Linear+activation on query vectors
  (``Gs.Query.transform == activation``, EmbeddingLayers.py:38-48).

All tables are xavier-uniform initialized (EmbeddingLayers.py:93-104) over
the logical (rows, d) shape, then stored FEATURE-MAJOR [d, rows]: a
[rows, 32] f32 array lane-pads 4x in HBM (CLAUDE.md layout rule), which
taxed every optimizer traversal of the ~600k-row tables (measured 4.56 ms
vs a 0.77 ms logical floor per Adam table update, docs/X0_TAIL_PROBE.json)
and forced a relayout transpose in the X0 assembly. Feature-major tables
make the X0 user/item parts pure lane slices, the Adam update a
no-padding bandwidth op, and the bag path transpose-free. The tables are
the sharding unit for model parallelism: rows (now the minor axis) are
sharded over the mesh 'model' axis (parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ihgnn_tpu.config import V
from ihgnn_tpu.models.common import TorchDense
from ihgnn_tpu.models.initializers import xavier_uniform


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _rows_1n_t(table_t: jnp.ndarray, n: int, rows: int) -> jnp.ndarray:
    """Feature-major rows 1..n of an embedding table: [d, rows] → [d, n].

    A static lane slice forward with a zero-pad backward. The arange-gather
    version lowers its BACKWARD to an XLA row scatter (~50 ns/row serial on
    v5e: measured 52 ms x0 fwd+bwd for the 700k-node bench — a third of
    the train step); the custom pad backward is a bandwidth op. The custom
    VJP also sidesteps the GSPMD slice-gradient NaN trap (CLAUDE.md) that
    forced the arange-gather formulation in the first place."""
    return jax.lax.slice(table_t, (0, 1), (table_t.shape[0], n + 1))


def _rows_1n_t_fwd(table_t, n, rows):
    return _rows_1n_t(table_t, n, rows), None


def _rows_1n_t_bwd(n, rows, _res, cot):
    return (jnp.pad(cot, ((0, 0), (1, rows - n - 1))),)


_rows_1n_t.defvjp(_rows_1n_t_fwd, _rows_1n_t_bwd)


def _table_init(logical_rows: int, zero_row0: bool):
    """Xavier-uniform over the *logical* (rows, d) shape (the fan axes the
    reference's torch init sees) stored feature-major — columns beyond
    ``logical_rows`` (sharding padding) are zero and never gathered. Row 0
    is zeroed when the table has a padding index (torch padding_idx=0)."""
    def init(key, shape, dtype=jnp.float32):
        d, rows_pad = shape
        w = jnp.zeros(shape, dtype)
        logical = xavier_uniform()(key, (logical_rows, d), dtype)
        if zero_row0:
            logical = logical.at[0].set(0.0)
        return w.at[:, :logical_rows].set(logical.T)
    return init


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class EmbeddingTables(nn.Module):
    user_count: int
    item_count: int
    vocab_size: int
    embedding_size: int
    query_transform: str = V.MEAN   # 'mean' | 'activation'
    # table rows are padded to a multiple of this so row-sharding over the
    # mesh 'model' axis divides evenly; extra rows are zero and unreachable
    row_multiple: int = 1

    def setup(self):
        d = self.embedding_size
        m = self.row_multiple
        self.user_table = self.param(
            "user_table", _table_init(self.user_count + 1, zero_row0=True),
            (d, _round_up(self.user_count + 1, m)))
        self.item_table = self.param(
            "item_table", _table_init(self.item_count + 1, zero_row0=True),
            (d, _round_up(self.item_count + 1, m)))
        # EmbeddingBag has no padding_idx in the reference; row 0 is still
        # only ever gathered under a zero mask.
        self.vocab_table = self.param(
            "vocab_table", _table_init(self.vocab_size + 1, zero_row0=False),
            (d, _round_up(self.vocab_size + 1, m)))
        if self.query_transform == V.ACTIVATION:
            self.query_mlp = TorchDense(d, d, name="query_mlp")

    def embed_user(self, user_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """0-based user ids → embeddings; None embeds all users."""
        if user_indices is None:
            # explicit index gather, not a [1:n+1] slice: slicing a
            # row-sharded table unevenly trips GSPMD into NaN gradients
            user_indices = jnp.arange(self.user_count, dtype=jnp.int32)
        return self.user_table[:, user_indices + 1].T

    def embed_item(self, item_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if item_indices is None:
            item_indices = jnp.arange(self.item_count, dtype=jnp.int32)
        return self.item_table[:, item_indices + 1].T

    def embed_query(self, query_words: jnp.ndarray, query_word_counts: jnp.ndarray,
                    query_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Bag-mean over word one-hots.

        query_words: [Q, L] word table rows (word idx + 1), 0-padded.
        query_word_counts: [Q] true bag sizes.
        Computes all Q query vectors then optionally selects rows — same
        shape of work as the reference (EmbeddingLayers.py:76-91), and on
        TPU the full [Q, L, d] gather feeds the GNN anyway.
        """
        gathered = self.vocab_table[:, query_words]            # [d, Q, L]
        mask = (query_words > 0).astype(gathered.dtype)        # [Q, L]
        summed = jnp.einsum("dql,ql->qd", gathered, mask)
        counts = jnp.maximum(query_word_counts, 1).astype(gathered.dtype)
        out = summed / counts[:, None]
        if query_indices is not None:
            out = out[query_indices]
        if self.query_transform == V.ACTIVATION:
            out = nn.relu(self.query_mlp(out))  # default activation: ReLU
        return out

    def all_features(self, query_words: jnp.ndarray,
                     query_word_counts: jnp.ndarray) -> jnp.ndarray:
        """X0 = [users | queries | items] stacked in global node order
        (RawGnn.py:112 `cat(self.embeddings(None, None, None))`)."""
        return jnp.concatenate([
            self.embed_user(None),
            self.embed_query(query_words, query_word_counts, None),
            self.embed_item(None),
        ], axis=0)

    def all_features_t(self, query_words: jnp.ndarray,
                       query_word_counts: jnp.ndarray,
                       bag=None) -> jnp.ndarray:
        """Feature-major X0ᵀ: [d, N]. The per-part transposes fuse into the
        concat write; the result has the node axis on the 128-lane minor
        dimension (no 4x lane padding for d=32). User/item parts ride the
        slice/pad custom VJP — their backward is a pad, not a row scatter.
        ``bag`` (ops/bag.BagPack, carried on the graph): route the word-bag
        backward through Clos + Pallas segment-sum instead of XLA's serial
        scatter; only the plain mean transform qualifies."""
        if bag is not None and self.query_transform == V.MEAN:
            from ihgnn_tpu.ops.bag import bag_mean_t
            inv_counts = 1.0 / jnp.maximum(
                query_word_counts, 1).astype(jnp.float32)
            query_part = bag_mean_t(self.vocab_table, query_words,
                                    inv_counts, bag,
                                    self.vocab_table.shape[1])
        else:
            query_part = self.embed_query(query_words, query_word_counts,
                                          None).T
        return jnp.concatenate([
            _rows_1n_t(self.user_table, self.user_count,
                       self.user_table.shape[1]),
            query_part,
            _rows_1n_t(self.item_table, self.item_count,
                       self.item_table.shape[1]),
        ], axis=1)
