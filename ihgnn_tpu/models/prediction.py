"""HEM-style prediction head (Models/PredictionLayers.py:6-44).

score(u, q, i) = <i_feat, m_uq> + bias_i   with  m_uq = λ·q + (1-λ)·u
(or cosine similarity instead of the dot product when configured).

Two entry points:
* ``score_rows``  — per-row scores for training batches ([R] triples).
* ``score_all``   — [B, item_count] scores of B (u,q) pairs against the
  whole catalog as one MXU matmul (replaces the reference's per-log python
  loop, TrainTestHelper.py:58-61).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _normal_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)  # torch init.normal_ defaults


class HemPredictionLayer(nn.Module):
    item_count: int
    lambda_muq: float = 0.5
    use_cosine_similarity: bool = False
    # RawGnn keeps the torch N(0,1) default (PredictionLayers.py:17-18);
    # Srrl passes zeros: its init_parameters zeroes every param with 'bias'
    # in the name (Models/Srrl.py:249-250), which covers items_bias.
    zero_bias_init: bool = False

    def setup(self):
        init = nn.initializers.zeros if self.zero_bias_init else _normal_init
        self.items_bias = self.param("items_bias", init, (self.item_count,))

    def _m_uq(self, user_feature: Optional[jnp.ndarray],
              query_feature: jnp.ndarray) -> jnp.ndarray:
        if user_feature is None:
            return query_feature
        lam = self.lambda_muq
        return lam * query_feature + (1.0 - lam) * user_feature

    def score_rows(self, user_feature: Optional[jnp.ndarray],
                   query_feature: jnp.ndarray, item_feature: jnp.ndarray,
                   item_indices: jnp.ndarray) -> jnp.ndarray:
        m = self._m_uq(user_feature, query_feature)
        bias = self.items_bias[item_indices]
        if self.use_cosine_similarity:
            sim = _cosine(item_feature, m)
        else:
            sim = jnp.sum(item_feature * m, axis=-1)
        return sim + bias

    def score_all(self, user_feature: Optional[jnp.ndarray],
                  query_feature: jnp.ndarray,
                  all_item_features: jnp.ndarray) -> jnp.ndarray:
        """[B, F] x [I, F] → [B, I]."""
        m = self._m_uq(user_feature, query_feature)
        if self.use_cosine_similarity:
            m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-8)
            items = all_item_features / jnp.maximum(
                jnp.linalg.norm(all_item_features, axis=-1, keepdims=True), 1e-8)
        else:
            items = all_item_features
        scores = jnp.dot(m, items.T, preferred_element_type=jnp.float32)
        return scores + self.items_bias[None, :]

    def score_all_t(self, user_feature_t: Optional[jnp.ndarray],
                    query_feature_t: jnp.ndarray,
                    all_item_features_t: jnp.ndarray) -> jnp.ndarray:
        """Feature-major variant: [F, B] x [F, I] → [B, I] (no transposes
        of the catalog)."""
        m_t = self._m_uq(user_feature_t, query_feature_t)
        items_t = all_item_features_t
        if self.use_cosine_similarity:
            m_t = m_t / jnp.maximum(
                jnp.linalg.norm(m_t, axis=0, keepdims=True), 1e-8)
            items_t = items_t / jnp.maximum(
                jnp.linalg.norm(items_t, axis=0, keepdims=True), 1e-8)
        scores = jax.lax.dot_general(m_t, items_t, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return scores + self.items_bias[None, :]


def _cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    # torch.cosine_similarity semantics (clamped norms)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), eps)
    return num / den
