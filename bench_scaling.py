"""Scaling-efficiency harness: sharded train step at 1/2/4/8 devices.

On real multi-chip hardware this measures examples/s over ICI; in this
environment it runs on virtual CPU devices (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count), which validates the sharded program
end-to-end and the harness itself — absolute numbers are CPU-bound and the
printed platform field says so.

Usage: python bench_scaling.py [--devices 1,2,4,8] [--edges 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--edges", type=int, default=100_000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--emb", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--platform", choices=["cpu", "native"], default="cpu",
                   help="'cpu' forces the virtual host mesh; 'native' uses "
                        "the default backend (real multi-chip hardware)")
    p.add_argument("--bf16_stream", action="store_true", default=False,
                   help="bf16 edge streams (the bench/stress production "
                        "config; engages the bf16 reduce-scatter partials)")
    p.add_argument("--pack_kernels", action="store_true", default=False,
                   help="force the per-shard kernel-pack (shard_map + "
                        "psum_scatter) path even on the CPU mesh — the "
                        "jnp reference twins run inside the bodies, so "
                        "the compiled collectives match the production "
                        "sharded program")
    a = p.parse_args()
    a.force_cpu = a.platform == "cpu"

    counts = [int(x) for x in a.devices.split(",")]
    if a.force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={max(counts)}")

    import jax
    if a.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bench import build_bench_graph
    from ihgnn_tpu.config import Config, MeshConfig, ModelConfig, TrainConfig
    from ihgnn_tpu.data.dataset import Batch
    from ihgnn_tpu.models.rawgnn import RawGnn
    from ihgnn_tpu.parallel.mesh import make_mesh
    from ihgnn_tpu.parallel.sharding import (pad_hypergraph_for_mesh,
                                             shard_batch, shard_graph,
                                             shard_state)
    from ihgnn_tpu.train.train import init_state, make_optimizer, make_train_step

    U, Q, I, V = 20_000, 10_000, 40_000, 10_000
    E, D, B, K = a.edges, a.emb, a.batch, 10
    platform = jax.default_backend()

    rng = np.random.default_rng(1)
    qw = rng.integers(1, V + 1, size=(Q, 4)).astype(np.int32)
    qc = np.full(Q, 4, np.int32)

    results = {}
    for n in counts:
        model_axis = 2 if n % 2 == 0 and n >= 4 else 1
        data_axis = n // model_axis
        cfg = Config(model=ModelConfig(embedding_size=D, gnn_layer_count=2,
                                       bf16_stream=a.bf16_stream),
                     train=TrainConfig(batch_size=B,
                                       random_negative_sample_size=K),
                     mesh=MeshConfig(data=data_axis, model=model_axis))
        mesh = make_mesh(cfg.mesh) if n > 1 else None
        graph, uqif = build_bench_graph(U, Q, I, E)
        # mesh → per-shard Pallas kernel packs (auto: TPU only;
        # --pack_kernels forces them for CPU-mesh HLO accounting)
        graph = pad_hypergraph_for_mesh(graph, data_axis, mesh=mesh,
                                        pack_kernels=(True if a.pack_kernels
                                                      else None))
        model = RawGnn(cfg=cfg.model, user_count=U, query_count=Q,
                       item_count=I, vocab_size=V,
                       table_row_multiple=model_axis)
        tx = make_optimizer(cfg)
        state = init_state(model, jax.random.key(0), graph, qw, qc, cfg, tx)

        rows = -(-B * (1 + K) // data_axis) * data_axis
        r = np.random.default_rng(0)
        idx = r.integers(0, E, B)
        batch = Batch(
            users=np.resize(uqif[idx, 0].astype(np.int32), rows),
            queries=np.resize(uqif[idx, 1].astype(np.int32), rows),
            items=np.resize(uqif[idx, 2].astype(np.int32), rows),
            flags=np.resize(np.ones(B, np.float32), rows),
            weight=np.ones(rows, np.float32))

        if n > 1:
            state = shard_state(state, mesh)
            graph = shard_graph(graph, mesh)
            batch = shard_batch(batch, mesh)
        # bind AFTER sharding so the timed program is the edge-sharded one
        # (mirrors cli.py; binding first would time the unsharded graph)
        step = make_train_step(model, graph, qw, qc, tx)

        # compiled-collective stats: the program's real comm volume, so
        # CPU-mesh efficiency can be read against comm rather than host
        # contention (utils/hlo_stats.py)
        from ihgnn_tpu.utils.hlo_stats import (collective_stats,
                                               collective_table, comm_bytes)
        compiled = step.inner.lower(state, *step.bound_args,
                                    batch).compile()
        hlo = compiled.as_text()
        stats = collective_stats(hlo)
        # per-array attribution (VERDICT r3 item 4): group the table rows
        # by (kind, attribution) so the artifact names WHICH arrays ride
        # each collective, not just one opaque byte sum
        by_array = {}
        for row in collective_table(hlo):
            key = f"{row['kind']}:{row['attribution']}"
            g = by_array.setdefault(key, {"count": 0, "bytes": 0,
                                          "shapes": []})
            g["count"] += 1
            g["bytes"] += row["bytes"]
            if row["shape"] not in g["shapes"] and len(g["shapes"]) < 4:
                g["shapes"].append(row["shape"])

        state, loss = step(state, batch)
        float(loss)  # scalar fetch: block_until_ready is unreliable on axon
        t0 = time.time()
        for _ in range(a.steps):
            state, loss = step(state, batch)
        float(loss)
        dt = (time.time() - t0) / a.steps
        results[n] = B / dt
        eff = results[n] / (results[counts[0]] * n / counts[0])
        print(json.dumps({
            "metric": "examples_per_s",
            "devices": n,
            "platform": platform,
            "value": round(results[n], 1),
            "unit": "examples/s",
            "scaling_efficiency": round(eff, 3),
            "comm_bytes_per_step": comm_bytes(hlo),
            "collectives": stats,
            "collectives_by_array": dict(sorted(
                by_array.items(), key=lambda kv: -kv[1]["bytes"])),
        }))


if __name__ == "__main__":
    main()
