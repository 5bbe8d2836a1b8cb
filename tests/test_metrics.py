"""Metric parity tests.

The golden values come from the reference's inline worked example
(/root/reference/Helpers/Metrics.py:165-193): 10 scores, ground truth
[0, 7, 9] → recommend order [2, 0, 5, 7, 6, 9, ...], hit ranks [1, 3, 5].
"""

import math

import numpy as np
import pytest

from ihgnn_tpu.train.metrics import K, Metrics, MetricsCollection, ranking_metrics

SCORES = [0.15, 0.05, 0.25, 0.05, 0.05, 0.13, 0.08, 0.12, 0.05, 0.07]
TRUTH = [0, 7, 9]

# hand-computed from the reference algorithm
EXP_HR = 3 / 3
EXP_DCG = 1 / math.log2(3) + 1 / math.log2(5) + 1 / math.log2(7)
EXP_IDCG = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
EXP_NDCG = EXP_DCG / EXP_IDCG
EXP_MAP = (1 / 2 + 2 / 4 + 3 / 6) / 3
EXP_MRR = 1 / 2


def test_host_metrics_worked_example():
    m = Metrics.calculate_on_all_items(np.array(SCORES), TRUTH, None, True)
    assert m.HitRatio_at10 == pytest.approx(EXP_HR)
    assert m.NDCG_at10 == pytest.approx(EXP_NDCG)
    assert m.MAP_at10 == pytest.approx(EXP_MAP)
    assert m.MRR_at10 == pytest.approx(EXP_MRR)


def test_vectorized_matches_worked_example():
    scores = np.array([SCORES], np.float32)
    truth = np.full((1, 5), -1, np.int32)
    truth[0, :3] = TRUTH
    rows = np.asarray(ranking_metrics(scores, truth, np.array([3], np.int32)))
    assert rows[0, 0] == pytest.approx(EXP_HR, abs=1e-4)
    assert rows[0, 1] == pytest.approx(EXP_NDCG, abs=1e-4)
    assert rows[0, 2] == pytest.approx(EXP_MAP, abs=1e-4)
    assert rows[0, 3] == pytest.approx(EXP_MRR, abs=1e-4)


def test_vectorized_matches_host_random():
    rng = np.random.default_rng(0)
    n_items = 50
    B, T = 32, 8
    scores = rng.standard_normal((B, n_items)).astype(np.float32)
    truth = np.full((B, T), -1, np.int32)
    counts = rng.integers(1, T + 1, B).astype(np.int32)
    for b in range(B):
        truth[b, :counts[b]] = rng.choice(n_items, size=counts[b], replace=False)

    rows = np.asarray(ranking_metrics(scores, truth, counts))
    for b in range(B):
        m = Metrics.calculate_on_all_items(scores[b], list(truth[b, :counts[b]]),
                                           None, True)
        assert rows[b, 0] == pytest.approx(m.HitRatio_at10, abs=1e-4), b
        assert rows[b, 1] == pytest.approx(m.NDCG_at10, abs=1e-4), b
        assert rows[b, 2] == pytest.approx(m.MAP_at10, abs=1e-4), b
        assert rows[b, 3] == pytest.approx(m.MRR_at10, abs=1e-4), b


def test_hr_denominator_is_min_truth_10():
    # 15 truth items, 10 of them in the top-10 → HR = 10/10, not 10/15
    n_items = 30
    scores = np.zeros(n_items, np.float32)
    truth = list(range(15))
    scores[:10] = np.arange(10, 0, -1)  # items 0..9 are the top-10
    m = Metrics.calculate_on_all_items(scores, truth, None, True)
    assert m.HitRatio_at10 == pytest.approx(1.0)


def test_graded_relevance_branch():
    # flags not all 1: IDCG computed over *hit* flags only (reference quirk)
    scores = np.array([0.9, 0.8, 0.1, 0.05], np.float32)
    truth, flags = [0, 2], [2, 3]  # item 0 hits at rank 0; item 2 at rank 2
    m = Metrics.calculate_on_all_items(scores, truth, flags, False)
    dcg = (2 ** 2 - 1) / math.log2(2) + (2 ** 3 - 1) / math.log2(4)
    idcg = (2 ** 3 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(3)
    assert m.NDCG_at10 == pytest.approx(dcg / idcg)


def test_no_hits():
    scores = np.array([1.0, 0.5, 0.1], np.float32)
    m = Metrics.calculate_on_all_items(scores, [2], None, True)
    # item 2 ranks 3rd of 3, within top-10 → actually hits; use disjoint truth
    scores = np.concatenate([np.arange(20, 0, -1, dtype=np.float32)])
    m = Metrics.calculate_on_all_items(scores, [15], None, True)
    assert m.HitRatio_at10 == 0.0
    assert m.MAP_at10 == 0.0
    assert m.MRR_at10 == 0.0


def test_metrics_collection_best():
    c = MetricsCollection(has_valid=True)
    for e, v in [(10, 0.3), (20, 0.6), (30, 0.5)]:
        mt, mv = Metrics(), Metrics()
        mt.NDCG_at10 = v / 2
        mv.NDCG_at10 = v
        c.add(e, mt, mv)
    epoch, test, valid = c.get_valid_best(key=lambda m: m.NDCG_at10)
    assert epoch == 20 and valid.NDCG_at10 == 0.6 and test.NDCG_at10 == 0.3


def test_epoch_schedule_parity():
    """Reference worked example (Helpers/ProcessController.py:114-118):
    20 epochs from 5, test-start 7, frequency 2 → tests fire at epochs
    11,13,...,23 and the final epoch 24."""
    from ihgnn_tpu.train.controller import EpochSchedule

    schedule = EpochSchedule(20, 5, 7, 2)
    fired = [e for e in schedule.epochs if schedule.is_test_epoch(e)]
    assert fired[0] == 11      # first epoch where e - start >= start_test
    assert all(b - a == 2 for a, b in zip(fired, fired[1:-1]))
    assert fired[-1] == 24     # always fires at the last epoch


def test_epoch_schedule_store_and_remaining_time():
    from ihgnn_tpu.train.controller import EpochSchedule

    # store only at the final epoch (the driver's default store schedule)
    s = EpochSchedule(10, 1, 3, 2, store_start=10, store_every=1000000)
    stored = [e for e in s.epochs if s.is_store_epoch(e)]
    assert stored == [10]

    assert s.remaining_text(1) == "n/a"
    s.record_train_seconds(10.0)
    s.record_train_seconds(20.0)
    # avg train 15s, no evals yet -> eval guessed at 30s; evals left are
    # counted EXACTLY over epochs this run still executes (r2 weak 6)
    evals_left = sum(1 for e in range(2, s.end_epoch + 1)
                     if s.is_test_epoch(e))
    approx = s.remaining_seconds(2)
    assert abs(approx - (15.0 * (s.end_epoch - 2)
                         + 30.0 * evals_left)) < 1e-6
    s.record_eval_seconds(60.0)
    assert s.remaining_seconds(2) == pytest.approx(
        15.0 * (s.end_epoch - 2) + 60.0 * evals_left)

    # resume: a run restarted at epoch 6 must not bill the evals the
    # previous run already performed
    r = EpochSchedule(10, 6, 3, 2, store_start=10, store_every=1000000)
    r.record_train_seconds(10.0)
    left = sum(1 for e in range(6, r.end_epoch + 1) if r.is_test_epoch(e))
    assert r.remaining_seconds(6) == pytest.approx(
        10.0 * (r.end_epoch - 6) + 20.0 * left)
