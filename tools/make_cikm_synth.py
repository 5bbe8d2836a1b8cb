"""Synthetic CIKM-shaped dataset through the REAL preprocessing pipeline
(VERDICT r3 item 5 — BASELINE.json config 3 "CIKM end-to-end").

Generates raw CIKM Cup 2016 Track 2 files (products.csv,
train-queries.csv with both query rows and category-browse rows,
train-clicks.csv), runs Step 1 (preprocess/cikm.py — category browses
become single-token queries offset past the vocabulary, the
SearchLog.py:282-288 quirk) and Step 3 (preprocess/onehot.py), and
writes Step-3 artifacts ready for tools/quality_parity.py.

Graded flags: CIKM clicks only ever set flag=1, but the reference's
flag quirks (`treat_all_1` clamp SearchLog.py:204-205, the min/max
dedup policy SearchLog.py:34-61) only matter when flags exceed 1 — as
in the AlibabaAir logs. A fraction of clicked interactions is therefore
bumped to flags 2/3 in the intermediate logs (simulating graded
interaction grades) so the clamp runs in anger during training on both
implementations.

Usage: python tools/make_cikm_synth.py [--out /tmp/cikm_ds] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_raw_files(raw_dir: str, seed: int, users: int, products: int,
                    sessions_per_user: int, cat_count: int,
                    words_per_title: int = 4):
    rng = np.random.default_rng(seed)
    os.makedirs(raw_dir, exist_ok=True)
    vocab_lo, vocab_hi = 100, 100 + 600          # item/query token id space

    products_path = os.path.join(raw_dir, "products.csv")
    with open(products_path, "w") as f:
        f.write("itemId;pricelog2;product.name.tokens\n")
        for i in range(products):
            tokens = ",".join(str(t) for t in rng.integers(
                vocab_lo, vocab_hi, words_per_title))
            f.write(f"P{i};{int(rng.integers(1, 12))};{tokens}\n")

    # popularity-skewed item draws (zipf-ish) so N-core style structure
    # emerges, and a shared query pool so queries repeat across users
    pop = 1.0 / np.arange(1, products + 1) ** 0.8
    pop /= pop.sum()
    query_pool = [",".join(str(t) for t in rng.integers(
        vocab_lo, vocab_hi, int(rng.integers(1, 4))))
        for _ in range(max(50, users // 2))]

    queries_path = os.path.join(raw_dir, "train-queries.csv")
    clicks = []
    qid = 0
    with open(queries_path, "w") as f:
        f.write("queryId;sessionId;userId;timeframe;duration;eventdate;"
                "searchstring.tokens;categoryId;items;is.test\n")
        for u in range(users):
            for s in range(sessions_per_user):
                shown = rng.choice(products, size=5, replace=False, p=pop)
                items = ",".join(f"P{i}" for i in shown)
                date = f"2016-05-{(qid % 27) + 1:02d}"
                if s % 3 == 2:
                    cat = int(rng.integers(0, cat_count))
                    f.write(f"{qid};S{qid};U{u};{qid * 7};100;{date};"
                            f";{cat};{items};FALSE\n")
                else:
                    q = query_pool[int(rng.integers(0, len(query_pool)))]
                    f.write(f"{qid};S{qid};U{u};{qid * 7};100;{date};"
                            f"{q};;{items};FALSE\n")
                # 1-2 clicks per session on shown items
                for c in range(int(rng.integers(1, 3))):
                    clicks.append((qid, int(qid) * 13 + c,
                                   f"P{shown[int(rng.integers(0, 5))]}"))
                qid += 1
        # rows the parser must skip: a test row and an NA-user row
        f.write(f"{qid};S{qid};U0;5;100;2016-05-01;101,102;;P1,P2;TRUE\n")
        f.write(f"{qid + 1};S{qid + 1};NA;5;100;2016-05-01;101,102;;P1,P2;"
                f"FALSE\n")

    clicks_path = os.path.join(raw_dir, "train-clicks.csv")
    with open(clicks_path, "w") as f:
        f.write("queryId;timeframe;itemId\n")
        for q, t, it in clicks:
            f.write(f"{q};{t};{it}\n")
    return queries_path, products_path, clicks_path


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from ihgnn_tpu.data.preprocess.cikm import step1_cikm
    from ihgnn_tpu.data.preprocess.onehot import step3_convert

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cikm_ds")
    ap.add_argument("--raw", default=None)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--users", type=int, default=800)
    ap.add_argument("--products", type=int, default=2500)
    ap.add_argument("--sessions", type=int, default=18)
    ap.add_argument("--categories", type=int, default=40)
    ap.add_argument("--graded_frac", type=float, default=0.3,
                    help="fraction of clicked interactions bumped to "
                         "flag 2/3 (graded-log simulation)")
    args = ap.parse_args()

    raw_dir = args.raw or (args.out + "_raw")
    q, p, c = write_raw_files(raw_dir, args.seed, args.users, args.products,
                              args.sessions, args.categories)
    inter = step1_cikm(q, p, c, with_category=True)

    # graded-flag simulation (see module docstring)
    rng = random.Random(args.seed + 1)
    bumped = 0
    for log in inter.logs:
        for i, flag in enumerate(log.interactions):
            if flag > 0 and rng.random() < args.graded_frac:
                log.interactions[i] = rng.choice((2, 3))
                bumped += 1
    print(f"bumped {bumped} clicked interactions to graded flags 2/3")

    random.seed(args.seed + 2)   # step3's fractional split draws
    step3_convert(inter, args.out)
    with open(os.path.join(args.out, "graph_info.txt")) as fh:
        print("graph_info:", fh.read().strip())
    # sanity: category-offset tokens present, graded flags present in train
    import csv
    flags = set()
    with open(os.path.join(args.out, "train_data.csv")) as fh:
        reader = csv.reader(fh)
        next(reader)                       # header row
        for row in reader:
            # columns: user,query,search_time,items,pages,positions,
            # interactions,times (schema.py SearchLog.column_names)
            flags.update(int(x) for x in row[6].split())
    print(f"train flag values: {sorted(flags)}")
    assert max(flags) > 1, "graded flags must survive to Step-3 artifacts"


if __name__ == "__main__":
    main()
