"""Probe: stress-step phase decomposition (fwd / fwd+bwd / remat / X0) on
the cached 10M-edge graph — locates the residual gap the per-kernel probe
(docs/STRESS_COMPONENTS.json) doesn't explain."""

from __future__ import annotations

import json
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

CACHE = ("/root/repo/.cache/"
         "benchgraph_v3_u1000000_q500000_i2000000_e10000000_s0.pkl")


def main():
    from ihgnn_tpu.config import ModelConfig
    from ihgnn_tpu.models.layers import IHGNNLayer

    with open(CACHE, "rb") as f:
        graph, _ = pickle.load(f)
    kp = graph.kp
    D, N = 32, graph.node_count
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32))
    res = {}

    def timed(fn, *args, iters=3):
        s = fn(*args, jnp.float32(1.0))
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            s = fn(*args, 1.0 + 0.0 * s)
        _ = float(s)
        return round((time.time() - t0) / iters * 1e3, 1)

    for order, name in ((3, "layer3"), (1, "layer1")):
        layer = IHGNNLayer(D, D, interaction_order=order, bf16_stream=True)
        lp = jax.jit(layer.init)(jax.random.key(1), x, graph)

        @jax.jit
        def l_fwd(x, lp, g, scale, layer=layer):
            out = layer.apply(lp, x * scale, g)
            return jnp.sum(out[:, :8])

        @jax.jit
        def l_both(x, lp, g, scale, layer=layer):
            def loss(x, lp):
                out = layer.apply(lp, x * scale, g)
                return jnp.sum(out * out)
            l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(x, lp)
            return l + 0 * jnp.sum(gx)

        res[f"{name}_fwd_ms"] = timed(l_fwd, x, lp, graph)
        print(name, "fwd", res[f"{name}_fwd_ms"], flush=True)
        res[f"{name}_fwdbwd_ms"] = timed(l_both, x, lp, graph)
        print(name, "fwdbwd", res[f"{name}_fwdbwd_ms"], flush=True)

    print(json.dumps(res))
    with open("/root/repo/docs/STRESS_STEP_PROBE.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
