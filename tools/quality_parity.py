"""Quality-parity experiment (round-1 VERDICT item 5).

Trains BOTH implementations — this framework's CLI and the torch-CPU
reference-formula replay (tools/reference_replay.py) — on the same Step-3
dataset artifacts over several seeds, to convergence, and writes a
side-by-side HR@10 / NDCG@10 / MAP@10 / MRR@10 table (PARITY.json +
markdown rows for BASELINE.md).

Parity is statistical, not bitwise: inits and negative sampling use
different RNGs (SURVEY.md §7.3 "Negative-sampling reproducibility"), so
the claim is that both implementations' best-valid-epoch test metrics
fall inside each other's seed spread.

Usage:
  python tools/quality_parity.py [--dataset DIR] [--seeds 3]
      [--epochs 60] [--out PARITY.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_ours(dataset, epochs, seed, emb, model="rawgnn"):
    """One CLI run on CPU; returns best-valid-epoch test metrics.

    The eval grid must match the replay's (every 5 from epoch 5): the Srrl
    model peaks around epochs 5-10, so a mismatched model-selection grid
    reads as a quality gap that isn't one."""
    code = f"""
import jax, json
jax.config.update('jax_platforms', 'cpu')
from ihgnn_tpu.cli import main
mc = main(['--dataset', {dataset!r}, '--epoch_count', '{epochs}',
           '--epoch_start_test', '5', '--epoch_test_frequency', '5',
           '--seed', '{seed}', '--emb', '{emb}', '--model', {model!r},
           '--result_dir', '/tmp/parity_ours_{model}_{seed}'])
epoch, test, valid = mc.get_valid_best(lambda m: m.NDCG_at10)
print('PARITY_RESULT ' + json.dumps({{
    'epoch': epoch,
    'test': {{'hr': test.HitRatio_at10, 'ndcg': test.NDCG_at10,
              'map': test.MAP_at10, 'mrr': test.MRR_at10}}}}))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"ours seed {seed} failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("PARITY_RESULT")][0]
    return json.loads(line.split(" ", 1)[1])


def run_replay(dataset, epochs, seed, emb, model="rawgnn"):
    script = ("reference_replay.py" if model == "rawgnn"
              else "srrl_replay.py")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script),
         "--dataset", dataset, "--epochs", str(epochs), "--seed", str(seed),
         "--emb", str(emb), "--eval_every", "5"],
        capture_output=True, text=True, cwd=REPO, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"replay seed {seed} failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    result = json.loads(out.stdout.strip().splitlines()[-1])
    return {"epoch": result["best"]["epoch"], "test": result["best"]["test"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/tmp/parity_ds")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--emb", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.json"))
    ap.add_argument("--fresh_dataset", action="store_true")
    ap.add_argument("--model", default="rawgnn", choices=("rawgnn", "srrl"),
                    help="which model family to compare; results merge "
                         "into --out under a per-model section")
    ap.add_argument("--section", default=None,
                    help="PARITY.json section name (default: the model "
                         "name); e.g. 'cikm' for the CIKM-shaped run")
    args = ap.parse_args()

    if args.fresh_dataset or not os.path.isdir(args.dataset):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ihgnn_tpu.data.artifacts import write_synthetic_dataset
        write_synthetic_dataset(args.dataset, seed=7, user_count=1500,
                                query_count=800, item_count=3000,
                                vocab_size=2000, log_count=12000)
        print(f"wrote dataset {args.dataset}", flush=True)

    rows = {"ours": [], "replay": []}
    for seed in range(args.seeds):
        t0 = time.time()
        r = run_ours(args.dataset, args.epochs, seed, args.emb, args.model)
        print(f"ours seed {seed}: {r} ({time.time()-t0:.0f}s)", flush=True)
        rows["ours"].append(r)
        t0 = time.time()
        r = run_replay(args.dataset, args.epochs, seed, args.emb, args.model)
        print(f"replay seed {seed}: {r} ({time.time()-t0:.0f}s)", flush=True)
        rows["replay"].append(r)

    def stats(entries, key):
        vals = [e["test"][key] for e in entries]
        return float(np.mean(vals)), float(np.std(vals))

    summary = {}
    for impl in ("ours", "replay"):
        summary[impl] = {k: stats(rows[impl], k)
                         for k in ("hr", "ndcg", "map", "mrr")}
    section = {"dataset": args.dataset, "seeds": args.seeds,
               "epochs": args.epochs, "runs": rows, "summary": summary}
    # merge per-model sections so rawgnn + srrl coexist in one PARITY.json
    # (legacy round-2 layout = a bare rawgnn section)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            existing = json.load(fh)
        if "summary" in existing:                    # legacy flat layout
            existing = {"rawgnn": existing}
    existing[args.section or args.model] = section
    with open(args.out, "w") as fh:
        json.dump(existing, fh, indent=1)

    print("\n| impl | HR@10 | NDCG@10 | MAP@10 | MRR@10 |")
    print("|---|---|---|---|---|")
    for impl in ("ours", "replay"):
        s = summary[impl]
        print(f"| {impl} | " + " | ".join(
            f"{s[k][0]:.4f}±{s[k][1]:.4f}" for k in ("hr", "ndcg", "map", "mrr"))
            + " |")


if __name__ == "__main__":
    main()
