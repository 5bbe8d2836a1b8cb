"""Offline preprocessing pipeline: synthetic raw files through
Step1(Amazon/CIKM) → Step2 subset → Step3 onehot → trainer dataset load."""

import json
import os
import random

import pytest

from ihgnn_tpu.data.dataset import EvalLogs, GraphData
from ihgnn_tpu.data.preprocess.amazon import step1_amazon
from ihgnn_tpu.data.preprocess.cikm import step1_cikm
from ihgnn_tpu.data.preprocess.intermediate import IntermediateData
from ihgnn_tpu.data.preprocess.onehot import step3_convert
from ihgnn_tpu.data.preprocess.subset import step2_subset
from ihgnn_tpu.data.preprocess.text import TextPreprocessor


def make_amazon_files(tmp_path, n_items=30, n_users=12, reviews_per_user=8):
    rng = random.Random(0)
    cats = [["Electronics", "Home Audio"], ["Electronics", "Cameras"],
            ["Books", "Science Fiction"], ["Books", "History"]]
    meta = tmp_path / "meta.json"
    with open(meta, "w") as f:
        for i in range(n_items):
            f.write(json.dumps({"asin": f"I{i:03d}",
                                "category": rng.choice(cats)}) + "\n")
    reviews = tmp_path / "reviews.json"
    with open(reviews, "w") as f:
        for u in range(n_users):
            for r in range(reviews_per_user):
                f.write(json.dumps({
                    "reviewerID": f"U{u:03d}",
                    "asin": f"I{rng.randrange(n_items):03d}",
                    "unixReviewTime": 1500000000 + u * 1000 + r,
                }) + "\n")
    return str(meta), str(reviews)


def test_amazon_pipeline_end_to_end(tmp_path):
    meta, reviews = make_amazon_files(tmp_path)
    inter = step1_amazon(meta, reviews)
    assert len(inter.logs) > 0
    assert all(len(log.item_ids) == 1 for log in inter.logs)
    assert all(log.interactions == [1] for log in inter.logs)

    sub = step2_subset(inter, n_core_item=2)
    assert len(sub.item_ids) <= len(inter.item_ids)
    # every surviving log references surviving items only
    items = set(sub.item_ids)
    for log in sub.logs:
        assert set(log.item_ids) <= items

    out = tmp_path / "final"
    random.seed(0)
    step3_convert(sub, str(out))
    for fn in ["graph_info.txt", "queries_multihot.txt", "train_data.csv",
               "valid_data.csv", "test_data.csv", "vocabulary.txt",
               "item_titles_multihot.txt", "search_ids_train.txt"]:
        assert (out / fn).exists(), fn

    data = GraphData.from_files(str(out))
    assert data.pos_count > 0
    g = data.hypergraph
    assert g.edge_count == data.pos_count
    test_logs = EvalLogs.from_file(str(out / "test_data.csv"))
    assert test_logs.count >= 0

    # ids in range
    assert data.pos_uqif[:, 0].max() < data.user_count
    assert data.pos_uqif[:, 1].max() < data.query_count
    assert data.pos_uqif[:, 2].max() < data.item_count


def make_cikm_files(tmp_path):
    rng = random.Random(1)
    products = tmp_path / "products.csv"
    with open(products, "w") as f:
        f.write("itemId;pricelog2;product.name.tokens\n")
        for i in range(20):
            tokens = ",".join(str(rng.randrange(50, 80)) for _ in range(3))
            f.write(f"P{i};5;{tokens}\n")
    queries = tmp_path / "train-queries.csv"
    with open(queries, "w") as f:
        f.write("queryId;sessionId;userId;timeframe;duration;eventdate;"
                "searchstring.tokens;categoryId;items;is.test\n")
        qid = 0
        for u in range(8):
            for s in range(6):
                items = ",".join(f"P{rng.randrange(20)}" for _ in range(4))
                if s % 3 == 2:   # category browse row
                    f.write(f"{qid};S{qid};U{u};{qid*7};100;2016-05-0{(s%5)+1};"
                            f";{rng.randrange(10, 14)};{items};FALSE\n")
                else:
                    words = ",".join(str(rng.randrange(50, 80)) for _ in range(2))
                    f.write(f"{qid};S{qid};U{u};{qid*7};100;2016-05-0{(s%5)+1};"
                            f"{words};;{items};FALSE\n")
                qid += 1
        # a test row and an NA-user row to be skipped
        f.write(f"{qid};S{qid};U0;5;100;2016-05-01;51,52;;P1,P2;TRUE\n")
        f.write(f"{qid+1};S{qid+1};NA;5;100;2016-05-01;51,52;;P1,P2;FALSE\n")
    clicks = tmp_path / "train-clicks.csv"
    with open(clicks, "w") as f:
        f.write("queryId;timeframe;itemId\n")
        for q in range(0, 40):
            f.write(f"{q};{q * 13};P{rng.randrange(20)}\n")
    return str(queries), str(products), str(clicks)


def test_cikm_pipeline_end_to_end(tmp_path):
    q, p, c = make_cikm_files(tmp_path)
    inter = step1_cikm(q, p, c, with_category=True)
    assert len(inter.logs) > 0
    # category browses became single-token queries with offset tokens
    max_item_token = max(int(w) for w in inter.vocabulary_item)
    offset_queries = [qs for qs in inter.queries if int(qs.split()[0]) > max_item_token]
    assert offset_queries, "category-browse queries should be offset"

    out = tmp_path / "final"
    random.seed(0)
    step3_convert(inter, str(out), split_ratios=(0.6, 0.2, 0.2))
    data = GraphData.from_files(str(out))
    assert data.pos_count > 0


def test_text_preprocessor():
    tp = TextPreprocessor()
    words = tp.preprocess("The Running Shoes 42 (Blue)!")
    assert "the" not in words           # stopword removed
    assert all(w.isalpha() for w in words)
    assert any(w.startswith("run") for w in words)   # stemmed


def test_preprocess_module_clis(tmp_path):
    """Drive the three steps through their `python -m` CLI surfaces."""
    from ihgnn_tpu.data.preprocess import amazon, onehot, subset

    meta, reviews = make_amazon_files(tmp_path)
    inter_dir = str(tmp_path / "inter")
    amazon.main(["--item", meta, "--search", reviews, "--result", inter_dir])
    sub_dir = str(tmp_path / "sub")
    subset.main(["--source", inter_dir, "--result", sub_dir, "--nitem", "2"])
    final_dir = str(tmp_path / "final2")
    random.seed(0)
    onehot.main(["--source", sub_dir, "--result", final_dir,
                 "--split", "0.7,0.1"])
    data = GraphData.from_files(final_dir)
    assert data.pos_count > 0


def test_presplit_cli_reproduces(tmp_path):
    from ihgnn_tpu.data.preprocess import amazon, onehot

    meta, reviews = make_amazon_files(tmp_path)
    inter = step1_amazon(meta, reviews)
    out1 = str(tmp_path / "o1")
    random.seed(3)
    step3_convert(inter, out1)
    out2 = str(tmp_path / "o2")
    step3_convert(inter, out2, presplit_dir=out1)
    for fn in ["train_data.csv", "valid_data.csv", "test_data.csv"]:
        with open(os.path.join(out1, fn)) as a, open(os.path.join(out2, fn)) as b:
            assert a.read() == b.read(), fn
