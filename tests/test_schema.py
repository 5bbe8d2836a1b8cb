"""Schema + collection tests: CSV round-trips, interacted-item dedup,
positive flattening, per-user temporal split invariants."""

import random

import numpy as np

from ihgnn_tpu.data.collections import RawSearchLogCollection, SearchLogCollection
from ihgnn_tpu.data.schema import PosInteraction, RawSearchLog, SearchLog


def make_log():
    return SearchLog(3, 5, "20200101", [7, 8, 7, 9], [1, 1, 2, 2],
                     [0, 1, 0, 1], [1, 0, 2, 0], ["t1", "NA", "t3", "NA"])


def test_searchlog_csv_roundtrip(tmp_path):
    log = make_log()
    assert SearchLog.parse(log.tostr()) == log

    col = SearchLogCollection([log, log])
    fn = str(tmp_path / "logs.csv")
    col.write(fn)
    back = SearchLogCollection.read(fn)
    assert len(back) == 2 and back[0] == log


def test_get_interacted_items_dedup_minmax():
    log = make_log()
    items, flags, all1 = log.get_interacted_items("min")
    assert items == [7] and flags == [1] and all1
    items, flags, all1 = log.get_interacted_items("max")
    assert items == [7] and flags == [2] and not all1


def test_pos_interaction_flattening_clamps_flags():
    log = make_log()
    pos = PosInteraction.from_search_log(log, treat_all_1=True)
    assert [(p.item, p.interaction) for p in pos] == [(7, 1), (7, 1)]
    pos = PosInteraction.from_search_log(log, treat_all_1=False)
    assert [(p.item, p.interaction) for p in pos] == [(7, 1), (7, 2)]


def test_raw_log_sort_and_subset():
    log = RawSearchLog("s1", "u1", "red shoes", "20200101")
    log.add_item("b", 2, 0, 0, "NA")
    log.add_item("a", 1, 3, 1, "t")
    log.add_item("c", 1, 1, 0, "NA")
    log.sort_items()
    assert log.item_ids == ["c", "a", "b"]  # 1001, 1003, 2000

    sub = log.subset({"a", "b"})
    assert sub.item_ids == ["a", "b"]
    assert sub.interactions == [1, 0]
    assert log.item_ids == ["c", "a", "b"]  # original untouched


def test_raw_roundtrip(tmp_path):
    log = RawSearchLog("s1", "u1", "red shoes", "20200101")
    log.add_item("a", 1, 0, 1, "t0")
    col = RawSearchLogCollection([log])
    fn = str(tmp_path / "raw.tsv")
    col.write(fn)
    back = RawSearchLogCollection.read(fn)
    assert back[0].tostr() == log.tostr()


def _make_raw_collection(n_users=10, logs_per_user=10):
    col = RawSearchLogCollection()
    sid = 0
    for u in range(n_users):
        for t in range(logs_per_user):
            log = RawSearchLog(f"s{sid}", f"u{u:03d}", "q", f"t{t:04d}")
            log.add_item("a", 1, 0, 1, "tt")
            col.append(log)
            sid += 1
    return col


def test_split_is_per_user_temporal():
    random.seed(0)
    col = _make_raw_collection(10, 10)
    train, valid, test = col.split_to_train_valid_test(0.7, 0.1, 0.2, None)
    assert len(train) + len(valid) + len(test) == 100
    # per user: train logs come before valid logs come before test logs
    for u in range(10):
        uid = f"u{u:03d}"
        tr = [l.search_time for l in train if l.user_id == uid]
        va = [l.search_time for l in valid if l.user_id == uid]
        te = [l.search_time for l in test if l.user_id == uid]
        seq = tr + va + te
        assert seq == sorted(seq)
        assert len(seq) == 10


def test_split_presplit_reproduces():
    random.seed(1)
    col = _make_raw_collection(5, 6)
    t1, v1, s1 = col.split_to_train_valid_test(0.7, 0.1, 0.2, None)
    ids = [set(l.search_id for l in part) for part in (t1, v1, s1)]
    t2, v2, s2 = col.split_to_train_valid_test(0.7, 0.1, 0.2, ids)
    assert [l.search_id for l in t2] == [l.search_id for l in t1]
    assert [l.search_id for l in v2] == [l.search_id for l in v1]
    assert [l.search_id for l in s2] == [l.search_id for l in s1]


def test_to_onehot():
    col = _make_raw_collection(2, 2)
    users = {f"u{u:03d}": u for u in range(2)}
    items = {"a": 0}
    queries = {"q": 0}
    oh = col.to_onehot(users, items, queries)
    assert oh[0].user in (0, 1) and oh[0].items == [0] and oh[0].query == 0
