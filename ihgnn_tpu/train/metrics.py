"""Ranking metrics: HR@10, NDCG@10, MAP@10 (+ MRR@10).

Two implementations with identical semantics:

* ``ranking_metrics`` — vectorized, jit-friendly: [B, I] score matrix →
  per-log metric rows, used by the batched evaluator (replaces the
  reference's per-log python loop + .cpu() sync, Helpers/Metrics.py:47-88).
* ``Metrics.calculate_on_all_items`` — host reference implementation, kept
  API-compatible with Helpers/Metrics.py (including its worked example) and
  used as the golden oracle in tests.

Reference quirks preserved exactly:
* HR denominator is min(|truth|, 10) (Metrics.py:80).
* MAP iterates ground-truth items in their *given order*; the hit counter j
  increments in that order, not by rank (Metrics.py:105-109).
* Graded-relevance NDCG (flags not all 1) computes IDCG over the flags of
  the *hit* items only, sorted descending (Metrics.py:77,86).
* DCG discount is 1/log2(rank+2) via python's log(2, base) idiom
  (Metrics.py:91-103).

MRR@10 is an addition (the reference does not compute MRR): reciprocal rank
of the best-ranked ground-truth item within the top 10, else 0.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

K = 10


def ranking_metrics(scores: jnp.ndarray, truth: jnp.ndarray,
                    truth_counts: jnp.ndarray, k: int = K) -> jnp.ndarray:
    """Per-log metrics from full-catalog scores.

    Args:
      scores: [B, I] model scores (one row per search log).
      truth: [B, T] ground-truth item ids, -1 padded (unique, first-seen order).
      truth_counts: [B] number of valid truth entries.
    Returns:
      [B, 4] rows of (HR@k, NDCG@k, MAP@k, MRR@k). Rows with
      truth_counts == 0 return zeros (callers mask padding anyway).
    """
    _, top = lax.top_k(scores, k)                           # [B, k]
    valid = truth >= 0                                      # [B, T]
    eq = top[:, None, :] == truth[:, :, None]               # [B, T, k]
    hit = eq.any(-1) & valid                                # [B, T]
    pos = jnp.where(hit, eq.argmax(-1), k)                  # [B, T] rank idx (0-based)

    denom = jnp.maximum(jnp.minimum(truth_counts, k), 1).astype(jnp.float32)
    n_hit = hit.sum(-1).astype(jnp.float32)                 # [B]
    hr = n_hit / denom

    # NDCG (all-1 relevance; the eval path always clamps flags to 1,
    # Dataset.py:310-313)
    discount = jnp.where(hit, 1.0 / jnp.log2(pos + 2.0), 0.0)
    dcg = discount.sum(-1)
    r = jnp.arange(truth.shape[1], dtype=jnp.float32)
    ideal_terms = 1.0 / jnp.log2(r + 2.0)                   # [T]
    idcg_prefix = jnp.cumsum(ideal_terms)                   # [T]
    idcg_idx = jnp.maximum(jnp.minimum(truth_counts, k), 1).astype(jnp.int32) - 1
    idcg = idcg_prefix[idcg_idx]
    idcg = jnp.maximum(idcg, 1e-12)
    ndcg = dcg / idcg

    # MAP with the reference's truth-order hit counter
    j = jnp.cumsum(hit.astype(jnp.float32), axis=-1)        # [B, T]
    ap_terms = jnp.where(hit, j / (pos + 1.0), 0.0)
    ap = jnp.where(n_hit > 0, ap_terms.sum(-1) / jnp.maximum(n_hit, 1.0), 0.0)

    # MRR@k
    best = jnp.min(jnp.where(hit, pos, k), axis=-1)
    mrr = jnp.where(best < k, 1.0 / (best + 1.0), 0.0)

    return jnp.stack([hr, ndcg, ap, mrr], axis=1)


class Metrics:
    """Accumulator with the reference's API (Helpers/Metrics.py:8-109),
    extended with MRR@10."""

    title = "HitRatio@10 NDCG@10 MAP@10 MRR@10"
    _idcg_cache = {}

    def __init__(self):
        self.HitRatio_at10 = 0.0
        self.NDCG_at10 = 0.0
        self.MAP_at10 = 0.0
        self.MRR_at10 = 0.0

    def add_to_self(self, m: "Metrics") -> None:
        self.HitRatio_at10 += m.HitRatio_at10
        self.NDCG_at10 += m.NDCG_at10
        self.MAP_at10 += m.MAP_at10
        self.MRR_at10 += m.MRR_at10

    def divide_and_get_new(self, count: float) -> "Metrics":
        m = Metrics()
        m.HitRatio_at10 = self.HitRatio_at10 / count
        m.NDCG_at10 = self.NDCG_at10 / count
        m.MAP_at10 = self.MAP_at10 / count
        m.MRR_at10 = self.MRR_at10 / count
        return m

    def to_string(self, no_title: bool = False) -> str:
        line = (f"{self.HitRatio_at10:.4f} {self.NDCG_at10:.4f} "
                f"{self.MAP_at10:.4f} {self.MRR_at10:.4f}")
        return line if no_title else self.title + "\n" + line

    __str__ = to_string
    __repr__ = to_string

    @classmethod
    def from_row(cls, row: Sequence[float]) -> "Metrics":
        m = cls()
        m.HitRatio_at10, m.NDCG_at10, m.MAP_at10, m.MRR_at10 = \
            float(row[0]), float(row[1]), float(row[2]), float(row[3])
        return m

    @staticmethod
    def calculate_on_all_items(model_outputs: np.ndarray,
                               interacted_items: List[int],
                               flags: Optional[List[int]],
                               flags_are_all_1: bool) -> "Metrics":
        """Host golden implementation (Helpers/Metrics.py:47-88)."""
        scores = np.asarray(model_outputs)
        # descending sort; stable on -scores mirrors torch's CPU sort closely
        order = np.argsort(-scores, kind="stable")[:K]
        rank_of = {int(item): pos for pos, item in enumerate(order)}

        indices_hit: List[int] = []
        flags_hit: List[int] = []
        if flags_are_all_1:
            for item in interacted_items:
                if item in rank_of:
                    indices_hit.append(rank_of[item])
        else:
            for item, flag in zip(interacted_items, flags):
                if item in rank_of:
                    indices_hit.append(rank_of[item])
                    flags_hit.append(flag)

        truth_in_10 = min(len(interacted_items), K)
        m = Metrics()
        m.HitRatio_at10 = len(indices_hit) / truth_in_10
        m.MAP_at10 = Metrics._map_all1(indices_hit)
        if flags_are_all_1:
            m.NDCG_at10 = Metrics._dcg_all1(indices_hit) / Metrics._idcg_all1(truth_in_10)
        else:
            flags_desc = sorted(flags_hit, reverse=True)
            idcg = Metrics._idcg_graded(flags_desc)
            m.NDCG_at10 = (Metrics._dcg_graded(indices_hit, flags_hit) / idcg
                           if idcg else 0.0)
        m.MRR_at10 = 1.0 / (min(indices_hit) + 1) if indices_hit else 0.0
        return m

    # log(2, base) == 1/log2(base) — the DCG discount (Metrics.py:91-103)
    @staticmethod
    def _dcg_all1(indices_hit: List[int]) -> float:
        return sum(math.log(2, i + 2) for i in indices_hit)

    @staticmethod
    def _idcg_all1(truth_count: int) -> float:
        cached = Metrics._idcg_cache.get(truth_count)
        if cached:
            return cached
        idcg = sum(math.log(2, r) for r in range(2, 2 + truth_count))
        Metrics._idcg_cache[truth_count] = idcg
        return idcg

    @staticmethod
    def _dcg_graded(indices_hit: List[int], flags_hit: List[int]) -> float:
        return sum(math.log(2, i + 2) * (2 ** r - 1)
                   for i, r in zip(indices_hit, flags_hit))

    @staticmethod
    def _idcg_graded(flags_descending: List[int]) -> float:
        return sum(math.log(2, i + 2) * (2 ** r - 1)
                   for i, r in enumerate(flags_descending))

    @staticmethod
    def _map_all1(indices_hit: List[int]) -> float:
        n = len(indices_hit)
        if n == 0:
            return 0.0
        return sum(j / (i + 1) for i, j in zip(indices_hit, range(1, n + 1))) / n


class MetricsCollection:
    """Per-epoch test/valid metric tracking with best-epoch selection
    (Helpers/Metrics.py:112-162)."""

    def __init__(self, has_valid: bool = False):
        self.has_valid = has_valid
        self._epochs: List[int] = []
        self._tests: List[Metrics] = []
        self._valids: List[Metrics] = []

    def add(self, epoch: int, m_test: Metrics, m_valid: Optional[Metrics] = None) -> None:
        if self.has_valid != (m_valid is not None):
            raise ValueError(f"has_valid is {self.has_valid}")
        self._epochs.append(epoch)
        self._tests.append(m_test)
        if m_valid is not None:
            self._valids.append(m_valid)

    def get_valid_best(self, key: Callable[[Metrics], Any],
                       max_is_best: bool = True) -> Tuple[int, Metrics, Metrics]:
        if not self.has_valid:
            raise ValueError("has_valid is False")
        pick = max if max_is_best else min
        i = self._valids.index(pick(self._valids, key=key))
        return self._epochs[i], self._tests[i], self._valids[i]

    def get_test_best(self, key: Callable[[Metrics], Any], max_is_best: bool = True):
        pick = max if max_is_best else min
        i = self._tests.index(pick(self._tests, key=key))
        if self.has_valid:
            return self._epochs[i], self._tests[i], self._valids[i]
        return self._epochs[i], self._tests[i]

    def iter_epoch_test(self) -> Iterable[Tuple[int, Metrics]]:
        return zip(self._epochs, self._tests)

    def iter_epoch_test_valid(self) -> Iterable[Tuple[int, Metrics, Metrics]]:
        if not self.has_valid:
            raise ValueError("has_valid is False")
        return zip(self._epochs, self._tests, self._valids)
