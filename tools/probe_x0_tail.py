"""Probe: X0 assembly decomposition + the optimizer tail (round 4).

Splits the x0_embed_fwdbwd accounting row into its parts and measures
the Adam/head tail that `docs/STEP_ACCOUNTING.json` lumps into
"composition overhead":

  x0_slices    user+item table slice/pad fwd+bwd (custom VJP; pure
               bandwidth — but the [rows, 32] tables are 4x lane-padded
               in HBM, CLAUDE.md layout rule)
  x0_bag       routed word-bag mean fwd+bwd
  adam_tables  one optax.adam update over the embedding-table tree only
               (reads p/m/v/g + writes p/m/v of ~22.4M rows-major params)

Writes docs/X0_TAIL_PROBE.json. Run alone on the TPU.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

U, Q, I, V, D = 200_000, 100_000, 400_000, 100_000, 32


def timed(fn, *args, iters=10):
    s = fn(*args, jnp.float32(1.0))
    _ = float(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args, 1.0 + 0.0 * s)
    _ = float(s)
    return round((time.time() - t0) / iters * 1e3, 2)


def main():
    from ihgnn_tpu.models.embedding import _rows_1n_t
    from ihgnn_tpu.ops.bag import bag_mean_t, make_bag_pack

    rng = np.random.default_rng(0)
    res = {}

    # feature-major [d, rows] tables (models/embedding.py round-4 layout)
    user_t = jnp.asarray(rng.standard_normal((D, U + 1)).astype(np.float32))
    item_t = jnp.asarray(rng.standard_normal((D, I + 1)).astype(np.float32))
    vocab_t = jnp.asarray(rng.standard_normal((D, V + 1)).astype(np.float32))

    @jax.jit
    def slices_both(ut, it, scale):
        def loss(ut, it):
            a = _rows_1n_t(ut * scale, U, U + 1)
            b = _rows_1n_t(it, I, I + 1)
            return jnp.sum(a * a) + jnp.sum(b * b)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(ut, it)
        return l + 0 * (jnp.sum(g[0]) + jnp.sum(g[1]))

    res["x0_slices_fwdbwd_ms"] = timed(slices_both, user_t, item_t)

    qw = rng.integers(1, V + 1, size=(Q, 4)).astype(np.int32)
    qc = np.full(Q, 4, np.int32)
    bag = make_bag_pack(qw, qc, V + 1)
    qwj = jnp.asarray(qw)
    inv_counts = jnp.full((Q,), 0.25, jnp.float32)

    @jax.jit
    def bag_both(vt, scale):
        def loss(vt):
            out = bag_mean_t(vt * scale, qwj, inv_counts, bag, V + 1)
            return jnp.sum(out * out)
        l, g = jax.value_and_grad(loss)(vt)
        return l + 0 * jnp.sum(g)

    res["x0_bag_fwdbwd_ms"] = timed(bag_both, vocab_t)

    # Adam over a table-shaped tree (the optimizer tail on the big params)
    import optax
    tx = optax.adam(1e-3)
    params = {"u": user_t, "i": item_t, "v": vocab_t}
    opt_state = jax.jit(tx.init)(params)
    grads = jax.tree.map(lambda a: a * 1e-3, params)

    @jax.jit
    def adam_step(params, opt_state, grads, scale):
        g = jax.tree.map(lambda a: a * scale, grads)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    p, s = adam_step(params, opt_state, grads, jnp.float32(1.0))
    _ = float(jnp.sum(p["u"][0]))
    t0 = time.time()
    for k in range(10):
        p, s = adam_step(p, s, grads, jnp.float32(1.0))
    _ = float(jnp.sum(p["u"][0]))
    res["adam_tables_ms"] = round((time.time() - t0) / 10 * 1e3, 2)

    # logical bytes: adam reads p,m,v,g and writes p,m,v => 7 traversals
    rows = (U + 1) + (I + 1) + (V + 1)
    res["adam_tables_floor_ms_logical"] = round(
        7 * rows * D * 4 / 819e9 * 1e3, 2)
    res["adam_tables_floor_ms_lane_padded"] = round(
        7 * rows * 128 * 4 / 819e9 * 1e3, 2)

    print(json.dumps(res, indent=1))
    with open("/root/repo/docs/X0_TAIL_PROBE.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
