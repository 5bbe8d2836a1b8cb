"""Srrl: knowledge-graph-embedding baseline with alternating KG/PS training.

Re-design of Models/Srrl.py. Two embedding spaces:

* ``KG``  — user + item tables + query word-bag (vocab) table, trained with
  translation-style triple scoring over "company" context (trainkg_*).
* ``PS``  — user + item tables only, fused with stop-gradient KG embeddings
  for personalized-search scoring (forward).

Init parity (Srrl.py:236-252): embedding tables are xavier-uniform then
row-L2-normalized; all non-embedding kernels are xavier-*normal*; all
biases (including the HEM item bias) are zero.

The reference's Main.py:176-181 constructs Srrl with
``prediction_layer_type=None``, which selects the 3-MLP scorer
(Srrl.py:65-67,154-158); ``prediction='hem'`` selects the HEM head instead.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ihgnn_tpu.config import ModelConfig, V
from ihgnn_tpu.models.common import Aggregation, MLP
from ihgnn_tpu.models.embedding import EmbeddingTables
from ihgnn_tpu.models.initializers import xavier_uniform
from ihgnn_tpu.models.prediction import HemPredictionLayer

MODE_TAIL = "tail-company-batch"
MODE_HEAD = "head-company-batch"
MODE_QUERY = "query-company-batch"
KG_MODES = (MODE_TAIL, MODE_HEAD, MODE_QUERY)


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics (norm clamped at eps)
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm


def _normalized_table(logical_rows: int, zero_row0: bool):
    """Xavier-uniform then row-L2-normalize (Srrl.py:236-237); the padding
    row 0 stays zero for user/item tables."""
    def init(key, shape, dtype=jnp.float32):
        w = xavier_uniform()(key, shape, dtype)
        w = _l2_normalize(w, axis=1)
        if zero_row0:
            w = w.at[0].set(0.0)
        return w
    return init


def _xavier_normal_kernel():
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    return init


class SrrlDense(nn.Module):
    """Dense with Srrl's init_parameters: xavier-normal kernel, zero bias."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=_xavier_normal_kernel(),
                        bias_init=nn.initializers.zeros, name="dense")(x)


class SrrlMLP(nn.Module):
    """Linear(in,in)-LeakyReLU-Linear(in,out) with Srrl init."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = SrrlDense(self.in_features, name="fc1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return SrrlDense(self.out_features, name="fc2")(x)


class SrrlAggregation(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(SrrlDense(self.out_features, name="fc")(x),
                             negative_slope=0.01)


class SrrlEmbeddings(nn.Module):
    """One embedding space. ``with_vocab=False`` drops the query table
    (the PS space, Srrl.py:38-42)."""

    user_count: int
    item_count: int
    vocab_size: int
    embedding_size: int
    with_vocab: bool = True

    def setup(self):
        d = self.embedding_size
        self.user_table = self.param(
            "user_table", _normalized_table(self.user_count + 1, True),
            (self.user_count + 1, d))
        self.item_table = self.param(
            "item_table", _normalized_table(self.item_count + 1, True),
            (self.item_count + 1, d))
        if self.with_vocab:
            self.vocab_table = self.param(
                "vocab_table", _normalized_table(self.vocab_size + 1, False),
                (self.vocab_size + 1, d))

    def embed_user(self, idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if idx is None:
            idx = jnp.arange(self.user_count, dtype=jnp.int32)
        return self.user_table[idx + 1]

    def embed_item(self, idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if idx is None:
            idx = jnp.arange(self.item_count, dtype=jnp.int32)
        return self.item_table[idx + 1]

    def embed_query(self, query_words: jnp.ndarray, query_word_counts: jnp.ndarray,
                    idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        gathered = self.vocab_table[query_words]
        mask = (query_words > 0).astype(gathered.dtype)
        summed = jnp.einsum("qld,ql->qd", gathered, mask)
        out = summed / jnp.maximum(query_word_counts, 1).astype(gathered.dtype)[:, None]
        if idx is not None:
            out = out[idx]
        return out


class Srrl(nn.Module):
    cfg: ModelConfig
    user_count: int
    query_count: int
    item_count: int
    vocab_size: int
    prediction: str = "mlp"   # 'mlp' (Main.py default) | 'hem'

    def setup(self):
        d = self.cfg.embedding_size
        kw = dict(user_count=self.user_count, item_count=self.item_count,
                  vocab_size=self.vocab_size, embedding_size=d)
        self.KG = SrrlEmbeddings(with_vocab=True, name="KG", **kw)
        self.PS = SrrlEmbeddings(with_vocab=False, name="PS", **kw)

        self.kg_aggre_head = SrrlAggregation(d, name="kg_aggre_head")
        self.kg_aggre_query = SrrlAggregation(d, name="kg_aggre_query")
        self.kg_aggre_tail = SrrlAggregation(d, name="kg_aggre_tail")
        self.kg_mlp_pre = SrrlMLP(2 * d, d, name="kg_mlp_pre")
        self.g_u = SrrlAggregation(d, name="g_u")
        self.g_i = SrrlAggregation(d, name="g_i")

        if self.prediction == "hem":
            # zero_bias_init: Srrl's init_parameters zeroes every param with
            # 'bias' in the name (Models/Srrl.py:249-250), incl. items_bias
            self.prediction_layer = HemPredictionLayer(
                item_count=self.item_count, lambda_muq=self.cfg.lambda_muq,
                zero_bias_init=True, name="prediction")
        else:
            self.ps_mlp_uq = SrrlMLP(2 * d, d, name="ps_mlp_uq")
            self.ps_mlp_ui = SrrlMLP(2 * d, d, name="ps_mlp_ui")
            self.ps_mlp_pred = SrrlMLP(2 * d, 1, name="ps_mlp_pred")

    # ---- KG phase (Srrl.py:72-98, 176-234) ----

    def _uq_context(self, u_emb: jnp.ndarray, q_emb: jnp.ndarray) -> jnp.ndarray:
        return self.kg_mlp_pre(_l2_normalize(
            jnp.concatenate([u_emb, q_emb], axis=-1)))

    def trainkg(self, triples: jnp.ndarray, neg_items: Optional[jnp.ndarray],
                company: jnp.ndarray, mode: str,
                query_words: jnp.ndarray, query_word_counts: jnp.ndarray
                ) -> jnp.ndarray:
        """Triple scores with company context.

        triples: [B, 3] (u, q, i) positive triples.
        neg_items: [B, k] negative item ids, or None for positive mode.
        company: [B] company entity id (item/user/query per mode). In
        negative mode for MODE_TAIL the company is the positive item itself
        (Srrl.py:187).
        Returns [B, 1] (positive) or [B, k] (negative) scores.
        """
        u = self.KG.embed_user(triples[:, 0])[:, None, :]      # [B,1,d]
        q = self.KG.embed_query(query_words, query_word_counts,
                                triples[:, 1])[:, None, :]

        if mode == MODE_TAIL:
            if neg_items is None:
                items = self.KG.embed_item(triples[:, 2])[:, None, :]
                company_emb = self.KG.embed_item(company)[:, None, :]
            else:
                items = self.KG.embed_item(neg_items)          # [B,k,d]
                company_emb = jnp.broadcast_to(
                    self.KG.embed_item(triples[:, 2])[:, None, :], items.shape)
            items_cat = _l2_normalize(jnp.concatenate([items, company_emb], -1))
            items_cat = self.kg_aggre_tail(items_cat)
            ctx = self._uq_context(u, q)
            return jnp.sum(items_cat * ctx, axis=2)

        if mode == MODE_HEAD:
            items = (self.KG.embed_item(triples[:, 2])[:, None, :]
                     if neg_items is None else self.KG.embed_item(neg_items))
            u2 = self.KG.embed_user(company)[:, None, :]
            users_cat = _l2_normalize(jnp.concatenate([u, u2], -1))
            ctx = self.kg_mlp_pre(_l2_normalize(jnp.concatenate(
                [self.kg_aggre_head(users_cat), q], -1)))
            return jnp.sum(items * ctx, axis=2)

        if mode == MODE_QUERY:
            items = (self.KG.embed_item(triples[:, 2])[:, None, :]
                     if neg_items is None else self.KG.embed_item(neg_items))
            q2 = self.KG.embed_query(query_words, query_word_counts,
                                     company)[:, None, :]
            queries_cat = _l2_normalize(jnp.concatenate([q, q2], -1))
            ctx = self.kg_mlp_pre(_l2_normalize(jnp.concatenate(
                [u, self.kg_aggre_query(queries_cat)], -1)))
            return jnp.sum(items * ctx, axis=2)

        raise ValueError(f"unknown KG mode {mode!r}")

    # ---- PS phase (Srrl.py:101-159) ----

    def _fuse(self, ps_emb: jnp.ndarray, kg_emb: jnp.ndarray, g) -> jnp.ndarray:
        latent = jnp.concatenate([ps_emb, jax.lax.stop_gradient(kg_emb)], -1)
        return g(_l2_normalize(latent))

    def latent_features(self, query_words: jnp.ndarray,
                        query_word_counts: jnp.ndarray):
        """All-entity latents (u_latent [U,d], q_latent [Q,d], i_latent [I,d])
        — the `save_features_for_test` protocol (Srrl.py:162-169)."""
        if self.cfg.srrl_kg_loss:
            u = self._fuse(self.PS.embed_user(None), self.KG.embed_user(None),
                           self.g_u)
            i = self._fuse(self.PS.embed_item(None), self.KG.embed_item(None),
                           self.g_i)
        else:
            u = self.PS.embed_user(None)
            i = self.PS.embed_item(None)
        q = self.KG.embed_query(query_words, query_word_counts, None)
        return u, q, i

    def _score_rows(self, u_latent, q_latent, i_latent, items) -> jnp.ndarray:
        if self.prediction == "hem":
            return self.prediction_layer.score_rows(u_latent, q_latent,
                                                    i_latent, items)
        uq = self.ps_mlp_uq(_l2_normalize(jnp.concatenate([u_latent, q_latent], -1)))
        ui = self.ps_mlp_ui(_l2_normalize(jnp.concatenate([u_latent, i_latent], -1)))
        return self.ps_mlp_pred(_l2_normalize(
            jnp.concatenate([uq, ui], -1)))[..., 0]

    def __call__(self, query_words: jnp.ndarray, query_word_counts: jnp.ndarray,
                 users: jnp.ndarray, queries: jnp.ndarray,
                 items: jnp.ndarray) -> jnp.ndarray:
        """PS-phase training scores for [R] (u, q, i) rows."""
        u_all, q_all, i_all = self.latent_features(query_words, query_word_counts)
        return self._score_rows(u_all[users], q_all[queries], i_all[items], items)

    def init_all(self, query_words: jnp.ndarray,
                 query_word_counts: jnp.ndarray) -> jnp.ndarray:
        """Initialization-only path: touches every submodule (flax creates
        params lazily per executed branch — the KG heads live on trainkg
        paths the PS forward never runs)."""
        triples = jnp.zeros((1, 3), jnp.int32)
        negs = jnp.zeros((1, 1), jnp.int32)
        company = jnp.zeros((1,), jnp.int32)
        for mode in KG_MODES:
            self.trainkg(triples, negs, company, mode,
                         query_words, query_word_counts)
        z = jnp.zeros((1,), jnp.int32)
        return self(query_words, query_word_counts, z, z, z)

    def all_features(self, query_words: jnp.ndarray,
                     query_word_counts: jnp.ndarray) -> jnp.ndarray:
        """Concatenated [U+Q+I, d] latents for the shared eval pipeline."""
        u, q, i = self.latent_features(query_words, query_word_counts)
        return jnp.concatenate([u, q, i], axis=0)

    def score_all_items(self, features: jnp.ndarray, users: jnp.ndarray,
                        queries: jnp.ndarray,
                        item_chunk: int = 8192) -> jnp.ndarray:
        """[B] (u, q) pairs → [B, I] catalog scores.

        The MLP scorer is pairwise in (row, item); the (u, q) branch is
        item-independent so it is computed once per row, and the item axis
        is processed in ``item_chunk`` blocks under ``lax.map`` — peak
        intermediate memory is O(B * item_chunk * d) instead of O(B * I * d),
        so full-catalog eval scales to stress-size catalogs (round-1
        VERDICT item 9)."""
        u_lat = features[users]
        q_lat = features[queries + self.user_count]
        i_lat = features[self.user_count + self.query_count:]
        if self.prediction == "hem":
            return self.prediction_layer.score_all(u_lat, q_lat, i_lat)

        B, d = u_lat.shape
        I = i_lat.shape[0]
        # uq branch does not depend on the item: hoist out of the chunk loop
        uq = self.ps_mlp_uq(_l2_normalize(
            jnp.concatenate([u_lat, q_lat], -1)))                    # [B, h]
        # unbind → pure (params, x) applications usable inside lax.map
        ui_mod, ui_vars = self.ps_mlp_ui.unbind()
        pred_mod, pred_vars = self.ps_mlp_pred.unbind()

        c = min(I, item_chunk)
        n_chunks = -(-I // c)
        i_pad = jnp.pad(i_lat, ((0, n_chunks * c - I), (0, 0)))

        def body(i_chunk):                                           # [c, d]
            u_b = jnp.broadcast_to(u_lat[:, None, :], (B, c, d))
            i_b = jnp.broadcast_to(i_chunk[None, :, :], (B, c, d))
            ui = ui_mod.apply(ui_vars, _l2_normalize(
                jnp.concatenate([u_b, i_b], -1)))                    # [B, c, h]
            uq_b = jnp.broadcast_to(uq[:, None, :], (B, c, uq.shape[-1]))
            return pred_mod.apply(pred_vars, _l2_normalize(
                jnp.concatenate([uq_b, ui], -1)))[..., 0]            # [B, c]

        scores = jax.lax.map(body, i_pad.reshape(n_chunks, c, d))
        return jnp.moveaxis(scores, 0, 1).reshape(B, n_chunks * c)[:, :I]
