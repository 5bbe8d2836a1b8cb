"""Measure the 100M-edge plan's PER-CHIP shard leg for real (VERDICT r4
item 3; BASELINE config 5; docs/PARALLELISM.md "the 100M-edge plan").

The P=8 deployment gives each chip: a contiguous 12.5M-edge u-sorted
shard of the 100M-edge graph (u-range U/8 = 1.25M users; q/i endpoints
span the full 5M/20M), the full [d, N=35M] node feature array (the
all-gathered input of the gather side), and the full [d, N] partial the
scatter side produces. This tool builds exactly that shard's compute on
ONE v5e chip — the plan's compute leg, previously only a linear
extrapolation from the 10M single-chip step — and records:

  step_ms      2 IHGNN layers (order 3 + 1) fwd+bwd over the shard,
               bf16 streams, remat, loss = sum(out^2), grads to x0
  adam_ms      one Adam update over the chip's 1/8 table rows
               (4.08M rows x d, feature-major) — the optimizer leg
  hbm_gb       device memory high-water mark (jax live buffers)

Comparison target: the plan's 777 ms/step projection (621.5 ms x 12.5/10
at the superseded kernel form). Writes STRESS100_SHARD.json.

Run alone on the TPU (single-tenant; ~14 GB peak — close to the 16 GB
budget by design, that is the point of the measurement).
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

U_FULL, Q_FULL, I_FULL = 10_000_000, 5_000_000, 20_000_000
N = U_FULL + Q_FULL + I_FULL
E_SHARD = 12_500_000
U_SHARD = 1_250_000          # this shard's contiguous u-range
D = 32


def build_shard_graph():
    from ihgnn_tpu.graph import build_hypergraph
    knobs = "_".join(f"{k}{os.environ.get(k, '')}" for k in
                     ("IHGNN_PACK_COLS", "IHGNN_CHUNK_ROWS_CAP")
                     if os.environ.get(k))
    cache = f"/root/repo/.cache/stress100_shard_v1{knobs}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    rng = np.random.default_rng(5)
    uqif = np.stack([
        rng.integers(0, U_SHARD, E_SHARD),            # shard-local users
        rng.integers(0, Q_FULL, E_SHARD),
        rng.integers(0, I_FULL, E_SHARD),
        np.ones(E_SHARD, np.int64)], axis=1).astype(np.int64)
    t0 = time.time()
    g = build_hypergraph(uqif, N, U_FULL, Q_FULL)
    print(f"# shard graph packed in {time.time()-t0:.0f}s "
          f"(chunks={len(g.kp.packs) if g.kp else 0})", flush=True)
    with open(cache, "wb") as f:
        pickle.dump(g, f)
    return g


def main():
    from ihgnn_tpu.models.layers import IHGNNLayer

    print("# building 12.5M-edge shard graph (N=35M)...", flush=True)
    graph = build_shard_graph()
    graph = jax.tree.map(jnp.asarray, graph)

    rng = np.random.default_rng(0)
    # x0 enters bf16 (the all-gathered wire format of the bf16-psum
    # combining — docs/PARALLELISM.md); layer outputs cast back to bf16
    # between layers like the production gather entry does
    print("# materializing [d, 35M] node features...", flush=True)
    x0 = jnp.asarray(rng.standard_normal((D, 2 ** 20))
                     .astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.tile(x0, (1, -(-N // 2 ** 20)))[:, :N]

    layer3 = IHGNNLayer(D, D, interaction_order=3, bf16_stream=True)
    layer1 = IHGNNLayer(D, D, interaction_order=1, bf16_stream=True)
    p3 = jax.jit(layer3.init)(jax.random.key(0), x0.astype(jnp.float32),
                              graph)
    p1 = jax.jit(layer1.init)(jax.random.key(1), x0.astype(jnp.float32),
                              graph)

    def fwd(x0, p3, p1, graph, scale):
        # features stay bf16 END-TO-END between layers (the production
        # wire format of the bf16-psum combining): the layer upcasts
        # internally where needed and its f32 [d, N] output casts back
        # immediately — a 35M-node f32 feature array (4.5 GB) plus its
        # f32 cotangent would blow the 16 GB budget
        x0b = (x0 * scale).astype(jnp.bfloat16)
        l3 = jax.checkpoint(
            lambda x: layer3.apply(p3, x, graph).astype(jnp.bfloat16))
        l1 = jax.checkpoint(
            lambda x: layer1.apply(p1, x, graph).astype(jnp.bfloat16))
        x2 = l1(l3(x0b))
        return jnp.sum((x2 * x2).astype(jnp.float32))

    @jax.jit
    def step(x0, p3, p1, graph, scale):
        l, (g0, gp3, gp1) = jax.value_and_grad(fwd, argnums=(0, 1, 2))(
            x0, p3, p1, graph, scale)
        return l + 0 * jnp.sum(g0.astype(jnp.float32))

    print("# compiling shard step...", flush=True)
    t0 = time.time()
    s = step(x0, p3, p1, graph, jnp.float32(1.0))
    _ = float(s)
    print(f"# compile+first {time.time()-t0:.0f}s", flush=True)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        s = step(x0, p3, p1, graph, 1.0 + 0.0 * s)
    _ = float(s)
    step_ms = (time.time() - t0) / iters * 1e3

    # HBM high-water mark
    try:
        ms = jax.local_devices()[0].memory_stats()
        hbm_gb = round(ms.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        hbm_gb = None
    print(f"# shard step {step_ms:.1f} ms, peak HBM {hbm_gb} GB",
          flush=True)

    # optimizer leg: Adam over this chip's 1/8 table rows, feature-major
    import optax
    rows = U_SHARD + 1 + (2_000_000 // 8) + (I_FULL // 8)
    table = jnp.asarray(rng.standard_normal((D, 2 ** 16)).astype(np.float32))
    table = jnp.tile(table, (1, -(-rows // 2 ** 16)))[:, :rows]
    tx = optax.adam(1e-3)
    params = {"t": table}
    opt = tx.init(params)
    grads = {"t": table * 1e-3}

    @jax.jit
    def adam_step(params, opt, grads, scale):
        g = {"t": grads["t"] * scale}
        up, opt2 = tx.update(g, opt, params)
        params2 = optax.apply_updates(params, up)
        return params2, opt2, jnp.sum(params2["t"][:, :8])

    params, opt, s = adam_step(params, opt, grads, jnp.float32(1.0))
    _ = float(s)
    t0 = time.time()
    for _ in range(10):
        params, opt, s = adam_step(params, opt, grads, 1.0 + 0.0 * s)
    _ = float(s)
    adam_ms = (time.time() - t0) / 10 * 1e3
    print(f"# table-shard adam {adam_ms:.1f} ms", flush=True)

    total = step_ms + adam_ms
    out = {
        "config": {"edges_shard": E_SHARD, "nodes": N, "d": D,
                   "users_shard": U_SHARD, "layers": 2,
                   "bf16_stream": True, "remat": True,
                   "table_rows_shard": int(rows)},
        "platform": "tpu v5e (1 chip) — the P=8 plan's per-chip leg",
        "step_ms": round(step_ms, 1),
        "adam_tables_ms": round(adam_ms, 1),
        "compute_leg_ms": round(total, 1),
        "peak_hbm_gb": hbm_gb,
        "plan_projection_ms": 777,
        "note": "compute leg only: X0 assembly and the head ride the "
                "table all-to-alls / batch arrays (comm side, "
                "docs/PARALLELISM.md); loss is a surrogate sum over the "
                "layer-2 output with gradients flowing to x0 and all "
                "layer params, matching the training step's sparse "
                "compute shape.",
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/STRESS100_SHARD.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
