"""Probe: measured cost of the row-major GAT path (VERDICT r2 item 6).

GAT and phase-2 attention run row-major XLA internally (x[src] gathers on
[nnz, d] + segment softmax, models/layers.py _GatCore) — off the
feature-major Pallas pipeline. This probe measures the layer fwd+bwd at
bench-like scale so keeping it row-major is a recorded decision with a
number attached, and sizes the prize for a routed feature-major rewrite.

Writes docs/GAT_PROBE.json.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from ihgnn_tpu.graph import build_graph2d
    from ihgnn_tpu.models.layers import GATLayer

    U, Q, I, E, D = 200_000, 100_000, 400_000, 2_000_000, 32
    rng = np.random.default_rng(0)
    n = U + Q + I
    import os, pickle
    cache = "/root/repo/.cache/gat_probe_graph_v3.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            graph = pickle.load(f)
    else:
        uqif = np.stack([
            rng.integers(0, U, E), rng.integers(0, Q, E),
            rng.integers(0, I, E), np.ones(E, np.int64)], axis=1)
        graph = build_graph2d(uqif.astype(np.int64), n, U, Q)
        with open(cache, "wb") as f:
            pickle.dump(graph, f)
    print(f"# 2D graph nnz={graph.nnz} routed={graph.gat_pk is not None}",
          flush=True)

    x = jnp.asarray(rng.standard_normal((D, n)).astype(np.float32))
    layer = GATLayer(D, D)
    params = jax.jit(layer.init)(jax.random.key(0), x, graph)

    @jax.jit
    def fwd(params, x, g, scale):
        out = layer.apply(params, x * scale, g)
        return jnp.sum(out[:, :8])

    @jax.jit
    def both(params, x, g, scale):
        def loss(params, x):
            out = layer.apply(params, x * scale, g)
            return jnp.sum(out * out)
        l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        return l + 0 * jnp.sum(gx)

    def timed(fn, iters=8):
        s = fn(params, x, graph, jnp.float32(1.0))
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            s = fn(params, x, graph, 1.0 + 0.0 * s)
        _ = float(s)
        return (time.time() - t0) / iters * 1e3

    # routed feature-major path (round 5, ops/gatconv.py) — the default
    # dispatch when the graph carries a gat pack
    res = {"nnz": int(graph.nnz), "d": D,
           "routed": graph.gat_pk is not None}
    key = "gat_routed" if graph.gat_pk is not None else "gat_rowmajor"
    res[key + "_fwd_ms"] = round(timed(fwd), 2)
    print(res, flush=True)
    res[key + "_fwdbwd_ms"] = round(timed(both), 2)
    print(res, flush=True)

    if graph.gat_pk is not None:
        # row-major reference path on the same graph (the round-4 number)
        graph_rm = graph.replace(gat_pk=None)
        params_rm = jax.jit(layer.init)(jax.random.key(0), x, graph_rm)

        @jax.jit
        def fwd_rm(params, x, g, scale):
            out = layer.apply(params, x * scale, g)
            return jnp.sum(out[:, :8])

        s = fwd_rm(params_rm, x, graph_rm, jnp.float32(1.0))
        _ = float(s)
        import time as _t
        t0 = _t.time()
        for _ in range(2):
            s = fwd_rm(params_rm, x, graph_rm, 1.0 + 0.0 * s)
        _ = float(s)
        res["gat_rowmajor_fwd_ms"] = round((_t.time() - t0) / 2 * 1e3, 2)

    print(json.dumps(res))
    with open("/root/repo/docs/GAT_PROBE.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
