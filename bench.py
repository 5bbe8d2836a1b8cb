"""Headline benchmark: hyperedge aggregation throughput of the full IHGNN
training step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Definition: one "hyperedge aggregation" = one edge's gather(3 endpoint
rows) + feature-cross + projection + scatter-add back to its 3 nodes,
inside a *training* step (forward + backward + Adam). With E edges and L
GNN layers, a step performs E*L forward aggregations; we report
  value = E * L * steps / elapsed_seconds   [aggregations/s/chip]

vs_baseline is the fraction of the HBM speed-of-light estimate for this
dtype/width (the op is bandwidth-bound: per edge-aggregation fwd+bwd moves
roughly 3 endpoint reads + 1 edge write + 1 edge read + 3 node
accumulations, x2 for the backward pass).

Config (mid-size, fits one v5e): 200k users / 100k queries / 400k items /
100k vocab, 2M hyperedges, d=32, 2 layers (order 3 + order 1), batch 1024
positives x 10 negatives.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_bench_graph(user_count, query_count, item_count, edge_count, seed=0):
    """Directly generate packed arrays (bypasses the python log pipeline).

    The packed graph (incl. the Clos routing tables, ~minutes of host work
    at 2M+ edges) is disk-cached per config so repeated bench/probe runs
    only pay it once."""
    import os
    import pickle

    from ihgnn_tpu.graph import build_hypergraph

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache")
    # v4: dg stage tables by default (round 4; v3 = σ packs + W-parametric
    # hier). Long grids now chunk into dg-eligible [<=2048, cols] slices
    # (ChunkedHyperPack) — stale pre-chunking 10M caches were deleted when
    # that landed; the knob is part of the key. The pack A/B env knobs
    # (packing.py) are part of the cache identity.
    knobs = "_".join(f"{k}{os.environ.get(k, '')}" for k in
                     ("IHGNN_SIGMA", "IHGNN_HIER_W", "IHGNN_PACK_COLS",
                      "IHGNN_STAGE_KIND", "IHGNN_CHUNK_ROWS_CAP")
                     if os.environ.get(k))
    key = f"benchgraph_v4{knobs}_u{user_count}_q{query_count}" \
          f"_i{item_count}_e{edge_count}_s{seed}.pkl"
    path = os.path.join(cache_dir, key)
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass  # stale/corrupt cache: rebuild

    rng = np.random.default_rng(seed)
    node_count = user_count + query_count + item_count
    uqif = np.stack([
        rng.integers(0, user_count, edge_count),
        rng.integers(0, query_count, edge_count),
        rng.integers(0, item_count, edge_count),
        np.ones(edge_count, np.int64),
    ], axis=1).astype(np.int64)
    out = build_hypergraph(uqif, node_count, user_count, query_count), uqif
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return out


def main():
    import argparse
    import os

    # wide grids shorten the transposed Clos mid stage (pick_grid
    # force_c): measured 68.1 -> 65.3 ms/step at the bench shape. The
    # pack cache key includes this knob; explicit env still overrides.
    os.environ.setdefault("IHGNN_PACK_COLS", "2048")

    import jax
    import jax.numpy as jnp

    from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
    from ihgnn_tpu.data.dataset import Batch, pad_ragged
    from ihgnn_tpu.models.rawgnn import RawGnn
    from ihgnn_tpu.train.train import init_state, make_optimizer, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=400_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--emb", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--remat", action="store_true", default=False)
    ap.add_argument("--f32_stream", action="store_true", default=False,
                    help="disable the bf16 conv streams (default: on)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json_out", default=None,
                    help="also write a full config+throughput record "
                         "(STRESS_r* artifacts)")
    args = ap.parse_args()

    U, Q, I, V = args.users, args.queries, args.items, args.vocab
    E, D, L = args.edges, args.emb, 2
    B, K = args.batch, 10

    cfg = Config(model=ModelConfig(embedding_size=D, gnn_layer_count=L,
                                   feature_interaction_order=3,
                                   remat=args.remat,
                                   bf16_stream=not args.f32_stream),
                 train=TrainConfig(batch_size=B, random_negative_sample_size=K))

    graph, uqif = build_bench_graph(U, Q, I, E)

    rng = np.random.default_rng(1)
    # queries: 4 words each (padded matrix [Q, 4])
    qw = rng.integers(1, V + 1, size=(Q, 4)).astype(np.int32)
    qc = np.full(Q, 4, np.int32)
    # routed word-bag backward (ops/bag.py) — GraphData attaches this
    # automatically; the bench builds its graph directly
    from ihgnn_tpu.ops.bag import make_bag_pack
    graph = graph.replace(bag=make_bag_pack(qw, qc, V + 1))

    model = RawGnn(cfg=cfg.model, user_count=U, query_count=Q, item_count=I,
                   vocab_size=V)
    tx = make_optimizer(cfg)
    t0 = time.time()
    state = init_state(model, jax.random.key(0), graph, qw, qc, cfg, tx)
    print(f"# init {time.time()-t0:.1f}s params="
          f"{sum(x.size for x in jax.tree.leaves(state.params)):,}")

    def make_batch(seed):
        r = np.random.default_rng(seed)
        idx = r.integers(0, E, B)
        rows = B * (1 + K)
        users = np.zeros(rows, np.int32)
        queries = np.zeros(rows, np.int32)
        items = np.zeros(rows, np.int32)
        flags = np.zeros(rows, np.float32)
        users[:B] = uqif[idx, 0]; queries[:B] = uqif[idx, 1]
        items[:B] = uqif[idx, 2]; flags[:B] = 1.0
        users[B:] = np.repeat(users[:B], K)
        queries[B:] = np.repeat(queries[:B], K)
        items[B:] = r.integers(0, I, B * K)
        return Batch(users=users, queries=queries, items=items, flags=flags,
                     weight=np.ones(rows, np.float32))

    step = make_train_step(model, graph, qw, qc, tx)
    batches = [jax.device_put(make_batch(s)) for s in range(4)]

    # warmup / compile; float() forces real completion — on remote-TPU
    # transports block_until_ready can return before execution finishes
    t0 = time.time()
    state, loss = step(state, batches[0])
    print(f"# compile+first step {time.time()-t0:.1f}s loss={float(loss):.4f}")
    state, loss = step(state, batches[1])
    _ = float(loss)

    n_steps = args.steps
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step(state, batches[i % 4])
    _ = float(loss)  # chained state threads dependencies; fetch syncs all
    dt = time.time() - t0
    step_time = dt / n_steps

    agg_per_s = E * L / step_time
    examples_per_s = B / step_time

    # speed-of-light: bandwidth-bound estimate. Per edge-aggregation,
    # fwd: 3 gathers (3*D*4 B) + edge write (D*4) + edge read + 3 scatter
    # accum (read+write ~ 6*D*4); bwd roughly doubles traffic.
    bytes_per_agg = (3 + 1 + 1 + 6) * D * 4 * 2
    hbm_gbps = 819e9  # TPU v5e HBM bandwidth
    sol_agg_per_s = hbm_gbps / bytes_per_agg

    print(f"# step_time {step_time*1e3:.1f} ms | {examples_per_s:,.0f} examples/s"
          f" | {agg_per_s/1e6:.1f}M agg/s | SoL {sol_agg_per_s/1e6:.0f}M agg/s")
    print(json.dumps({
        "metric": "hyperedge_aggregations_per_s_per_chip",
        "value": round(agg_per_s, 1),
        "unit": "aggregations/s",
        "vs_baseline": round(agg_per_s / sol_agg_per_s, 4),
    }))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "config": {"edges": E, "users": U, "queries": Q,
                           "items": I, "vocab": V, "emb": D, "layers": L,
                           "remat": args.remat,
                           "bf16_stream": not args.f32_stream,
                           "params": int(sum(x.size for x in
                                             jax.tree.leaves(state.params)))},
                "platform": "tpu v5e (1 chip)",
                "step_time_ms": round(step_time * 1e3, 1),
                "examples_per_s": round(examples_per_s),
                "hyperedge_aggregations_per_s": round(agg_per_s, 1),
            }, f, indent=1)


if __name__ == "__main__":
    main()
