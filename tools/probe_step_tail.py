"""Probe: where the NON-kernel part of the bench train step goes.

The component breakdown (tools/probe_step_breakdown.py) accounts for
~74 ms of the 113 ms step (gather/scatter/interact/x0, fwd+bwd). This
probe splits the remainder in separate jitted programs on the bench
config (2M edges, bf16 streams, batch 1024x11):

  fwd_loss     — loss_fn forward only (full conv + scoring + BCE)
  fwd_bwd      — jax.value_and_grad(loss_fn) (no optimizer)
  full_step    — fwd + bwd + Adam (the bench number)
  adam         — full_step - fwd_bwd (derived)
  score_tail   — fwd_loss - model_all_features_fwd (scoring + BCE)

Timing discipline per CLAUDE.md: scalar fetch per boundary, state/data
dependencies threaded through timed loops. Real TPU, one process,
natural completion.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

ITERS = 10


def main():
    from bench import build_bench_graph
    from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
    from ihgnn_tpu.data.dataset import Batch
    from ihgnn_tpu.models.rawgnn import RawGnn
    from ihgnn_tpu.ops.bag import make_bag_pack
    from ihgnn_tpu.train.train import (bce_with_logits, init_state,
                                       make_optimizer)

    E, D, L = 2_000_000, 32, 2
    U, Q, I, V = 200_000, 100_000, 400_000, 100_000
    B, K = 1024, 10

    cfg = Config(model=ModelConfig(embedding_size=D, gnn_layer_count=L,
                                   feature_interaction_order=3,
                                   bf16_stream=True),
                 train=TrainConfig(batch_size=B,
                                   random_negative_sample_size=K))
    print("# building graph...", flush=True)
    graph, uqif = build_bench_graph(U, Q, I, E)
    rng = np.random.default_rng(1)
    qw_np = rng.integers(1, V + 1, size=(Q, 4)).astype(np.int32)
    qc_np = np.full(Q, 4, np.int32)
    graph = graph.replace(bag=make_bag_pack(qw_np, qc_np, V + 1))

    model = RawGnn(cfg=cfg.model, user_count=U, query_count=Q, item_count=I,
                   vocab_size=V)
    tx = make_optimizer(cfg)
    state = init_state(model, jax.random.key(0), graph, qw_np, qc_np, cfg, tx)
    print(f"# init done params="
          f"{sum(x.size for x in jax.tree.leaves(state.params)):,}",
          flush=True)

    graph_j = jax.tree.map(jnp.asarray, graph)
    qw = jnp.asarray(qw_np)
    qc = jnp.asarray(qc_np)

    r = np.random.default_rng(7)
    idx = r.integers(0, E, B)
    rows = B * (1 + K)
    users = np.zeros(rows, np.int32); queries = np.zeros(rows, np.int32)
    items = np.zeros(rows, np.int32); flags = np.zeros(rows, np.float32)
    users[:B] = uqif[idx, 0]; queries[:B] = uqif[idx, 1]
    items[:B] = uqif[idx, 2]; flags[:B] = 1.0
    users[B:] = np.repeat(users[:B], K)
    queries[B:] = np.repeat(queries[:B], K)
    items[B:] = r.integers(0, I, B * K)
    batch = jax.device_put(Batch(users=users, queries=queries, items=items,
                                 flags=flags,
                                 weight=np.ones(rows, np.float32)))

    def loss_fn(params):
        logits = model.apply(params, graph_j, qw, qc,
                             batch.users, batch.queries, batch.items)
        return bce_with_logits(logits, batch.flags, batch.weight)

    results = {}

    def report(name, ms):
        results[name] = round(ms, 3)
        print(name, results[name], flush=True)

    def timed_params(make_out, params, iters=ITERS):
        """make_out(params) -> (new_params_like, scalar). Threads the
        params pytree through the loop; scalar fetch per boundary."""
        fn = jax.jit(make_out)
        p, s = fn(params)
        _ = float(s)
        p, s = fn(p)
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            p, s = fn(p)
        _ = float(s)
        return (time.time() - t0) / iters * 1e3

    # --- forward only
    def fwd(params):
        loss = loss_fn(params)
        bump = (0.0 * loss).astype(jnp.float32)
        return jax.tree.map(lambda x: x + bump.astype(x.dtype), params), loss

    report("fwd_loss_ms", timed_params(fwd, state.params))

    # --- forward of all_features alone (same graph/program as the step)
    def feats(params):
        f = model.apply(params, graph_j, qw, qc, method=model.all_features)
        s = jnp.sum(f[:, ::4097].astype(jnp.float32))
        bump = (0.0 * s).astype(jnp.float32)
        return jax.tree.map(lambda x: x + bump.astype(x.dtype), params), s

    report("all_features_fwd_ms", timed_params(feats, state.params))

    # --- forward + backward (no optimizer)
    def fwdbwd(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd = jax.tree.map(lambda p, g: p - 0.0 * g.astype(p.dtype),
                           params, grads)
        return upd, loss

    report("fwd_bwd_ms", timed_params(fwdbwd, state.params))

    # --- full train step (bench program)
    from ihgnn_tpu.train.train import make_train_step
    step = make_train_step(model, graph, qw_np, qc_np, tx)
    st, loss = step(state, batch)
    _ = float(loss)
    st, loss = step(st, batch)
    _ = float(loss)
    t0 = time.time()
    for _ in range(ITERS):
        st, loss = step(st, batch)
    _ = float(loss)
    report("full_step_ms", (time.time() - t0) / ITERS * 1e3)

    results["adam_tail_ms"] = round(
        results["full_step_ms"] - results["fwd_bwd_ms"], 3)
    results["bwd_tail_ms"] = round(
        results["fwd_bwd_ms"] - results["fwd_loss_ms"], 3)
    results["score_tail_ms"] = round(
        results["fwd_loss_ms"] - results["all_features_fwd_ms"], 3)
    print(json.dumps(results))
    with open("docs/STEP_TAIL_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
