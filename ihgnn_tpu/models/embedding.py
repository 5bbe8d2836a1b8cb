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

All tables are xavier-uniform initialized (EmbeddingLayers.py:93-104). The
tables are the sharding unit for model parallelism: rows are sharded over
the mesh 'model' axis (parallel/sharding.py).
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
def _rows_1n_t(table: jnp.ndarray, n: int, rows: int) -> jnp.ndarray:
    """Feature-major rows 1..n of an embedding table: [rows, d] → [d, n].

    Equivalent to ``table[jnp.arange(n) + 1].T`` but with a static slice
    forward and a zero-pad backward. The arange-gather version lowers its
    BACKWARD to an XLA row scatter (~50 ns/row serial on v5e: measured
    52 ms x0 fwd+bwd for the 700k-node bench — a third of the train step);
    the custom pad backward is a bandwidth op. The custom VJP also
    sidesteps the GSPMD slice-gradient NaN trap (CLAUDE.md) that forced
    the arange-gather formulation in the first place."""
    return jax.lax.slice(table, (1, 0), (n + 1, table.shape[1])).T


def _rows_1n_t_fwd(table, n, rows):
    return _rows_1n_t(table, n, rows), None


def _rows_1n_t_bwd(n, rows, _res, cot):
    return (jnp.pad(cot.T, ((1, rows - n - 1), (0, 0))),)


_rows_1n_t.defvjp(_rows_1n_t_fwd, _rows_1n_t_bwd)


def _table_init(logical_rows: int, zero_row0: bool):
    """Xavier-uniform over the *logical* (rows, d) shape — rows beyond
    ``logical_rows`` (sharding padding) are zero and never gathered. Row 0 is
    zeroed when the table has a padding index (torch padding_idx=0)."""
    def init(key, shape, dtype=jnp.float32):
        w = jnp.zeros(shape, dtype)
        logical = xavier_uniform()(key, (logical_rows, shape[1]), dtype)
        if zero_row0:
            logical = logical.at[0].set(0.0)
        return w.at[:logical_rows].set(logical)
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
            (_round_up(self.user_count + 1, m), d))
        self.item_table = self.param(
            "item_table", _table_init(self.item_count + 1, zero_row0=True),
            (_round_up(self.item_count + 1, m), d))
        # EmbeddingBag has no padding_idx in the reference; row 0 is still
        # only ever gathered under a zero mask.
        self.vocab_table = self.param(
            "vocab_table", _table_init(self.vocab_size + 1, zero_row0=False),
            (_round_up(self.vocab_size + 1, m), d))
        if self.query_transform == V.ACTIVATION:
            self.query_mlp = TorchDense(d, d, name="query_mlp")

    def embed_user(self, user_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """0-based user ids → embeddings; None embeds all users."""
        if user_indices is None:
            # explicit index gather, not a [1:n+1] slice: slicing a
            # row-sharded table unevenly trips GSPMD into NaN gradients
            user_indices = jnp.arange(self.user_count, dtype=jnp.int32)
        return self.user_table[user_indices + 1]

    def embed_item(self, item_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if item_indices is None:
            item_indices = jnp.arange(self.item_count, dtype=jnp.int32)
        return self.item_table[item_indices + 1]

    def embed_query(self, query_words: jnp.ndarray, query_word_counts: jnp.ndarray,
                    query_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Bag-mean over word one-hots.

        query_words: [Q, L] word table rows (word idx + 1), 0-padded.
        query_word_counts: [Q] true bag sizes.
        Computes all Q query vectors then optionally selects rows — same
        shape of work as the reference (EmbeddingLayers.py:76-91), and on
        TPU the full [Q, L, d] gather feeds the GNN anyway.
        """
        gathered = self.vocab_table[query_words]              # [Q, L, d]
        mask = (query_words > 0).astype(gathered.dtype)        # [Q, L]
        summed = jnp.einsum("qld,ql->qd", gathered, mask)
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
                                    self.vocab_table.shape[0])
        else:
            query_part = self.embed_query(query_words, query_word_counts,
                                          None).T
        return jnp.concatenate([
            _rows_1n_t(self.user_table, self.user_count,
                       self.user_table.shape[0]),
            query_part,
            _rows_1n_t(self.item_table, self.item_count,
                       self.item_table.shape[0]),
        ], axis=1)
