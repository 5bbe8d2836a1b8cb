"""Probe: per-component timing of the IHGNN training step on the real TPU.

Times, in separate jitted programs over the bench graph (2M edges, d=32):
  gather fwd / fwd+bwd     (windowed expand + Clos permute stages)
  interact fwd / fwd+bwd   (fused Pallas interaction kernel)
  scatter fwd / fwd+bwd    (permute-to-t1 + CSR segment-sum)
  model fwd                (full RawGnn forward)
  train step               (fwd + bwd + Adam)

Timing discipline per CLAUDE.md: scalar fetch per boundary, data deps
threaded through the loop. Run on the real TPU to natural completion,
one process at a time.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, arg, iters=10):
    out = fn(arg)
    _ = float(out[1])                         # compile + first run
    arg2 = arg * (1.0 + 0.0 * out[1])         # thread dependency
    out = fn(arg2)
    _ = float(out[1])
    t0 = time.time()
    carry = arg2
    for _ in range(iters):
        carry, s = fn(carry)
    _ = float(s)
    dt = (time.time() - t0) / iters * 1e3
    return dt


def main():
    print("# building graph...", flush=True)
    from bench import build_bench_graph
    from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
    from ihgnn_tpu.models.interaction import FeatureInteractor
    from ihgnn_tpu.ops.hyperagg import make_hyper_ops

    E, D = 2_000_000, 32
    U, Q, I = 200_000, 100_000, 400_000
    graph, _ = build_bench_graph(U, Q, I, E)
    n = graph.node_count
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D, n)).astype(np.float32))

    gather, scatter = make_hyper_ops(graph)
    kp = graph.kp
    e_pad = kp.e_pad
    print(f"# n={n} e={kp.e} e_pad={e_pad} rows={kp.rows} cols={kp.cols}",
          flush=True)

    results = {}

    # --- gather fwd
    @jax.jit
    def g_fwd(x):
        u, q, i = gather(x)
        s = jnp.sum(u) + jnp.sum(q) + jnp.sum(i)
        return x * (1 + 0 * s), s

    results["gather_fwd_ms"] = timed(g_fwd, x)
    print("gather_fwd", results["gather_fwd_ms"], flush=True)

    # --- gather fwd+bwd
    @jax.jit
    def g_both(x):
        def loss(x):
            u, q, i = gather(x)
            return jnp.sum(u * u) + jnp.sum(q * q) + jnp.sum(i * i)
        l, g = jax.value_and_grad(loss)(x)
        return x + 0 * g, l

    results["gather_fwdbwd_ms"] = timed(g_both, x)
    print("gather_fwdbwd", results["gather_fwdbwd_ms"], flush=True)

    # --- interactor fwd+bwd (order 3, fused kernel path)
    # NOTE: roles/params enter as jit ARGUMENTS — closed-over arrays this
    # size bake into the HLO and overflow the remote-compile payload
    mod = FeatureInteractor(3, D, D)
    roles0 = tuple(jnp.asarray(rng.standard_normal((D, e_pad))
                               .astype(np.float32)) for _ in range(3))
    params = mod.init(jax.random.key(0), roles0, fused_ok=True)

    @functools.partial(jax.jit, static_argnames=("fused",))
    def i_fwd(r0, r1, r2, params, fused):
        out = mod.apply(params, (r0, r1, r2), fused_ok=fused)
        s = jnp.sum(out)
        return r0 * (1 + 0 * s), s

    @functools.partial(jax.jit, static_argnames=("fused",))
    def i_both(r0, r1, r2, params, fused):
        def loss(r0, params):
            out = mod.apply(params, (r0, r1, r2), fused_ok=fused)
            return jnp.sum(out * out)
        l, (g0, _) = jax.value_and_grad(loss, argnums=(0, 1))(r0, params)
        return r0 + 0 * g0, l

    def timed_i(fn, fused, iters=10):
        carry, s = fn(roles0[0], roles0[1], roles0[2], params, fused)
        _ = float(s)
        carry, s = fn(carry, roles0[1], roles0[2], params, fused)
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            carry, s = fn(carry, roles0[1], roles0[2], params, fused)
        _ = float(s)
        return (time.time() - t0) / iters * 1e3

    results["interact_fwd_ms"] = timed_i(i_fwd, True)
    print("interact_fwd", results["interact_fwd_ms"], flush=True)
    results["interact_fwdbwd_ms"] = timed_i(i_both, True)
    print("interact_fwdbwd", results["interact_fwdbwd_ms"], flush=True)
    results["interact_fwdbwd_xla_ms"] = timed_i(i_both, False)
    print("interact_fwdbwd_xla", results["interact_fwdbwd_xla_ms"], flush=True)

    # --- scatter fwd+bwd
    ef = jnp.asarray(rng.standard_normal((D, e_pad)).astype(np.float32))

    @jax.jit
    def s_fwd(ef):
        out = scatter(ef)
        s = jnp.sum(out)
        return ef * (1 + 0 * s), s

    results["scatter_fwd_ms"] = timed(s_fwd, ef)
    print("scatter_fwd", results["scatter_fwd_ms"], flush=True)

    @jax.jit
    def s_both(ef):
        def loss(ef):
            return jnp.sum(scatter(ef) ** 2)
        l, g = jax.value_and_grad(loss)(ef)
        return ef + 0 * g, l

    results["scatter_fwdbwd_ms"] = timed(s_both, ef)
    print("scatter_fwdbwd", results["scatter_fwdbwd_ms"], flush=True)

    # --- bf16-stream variants (the bench default path)
    gather16, scatter16 = make_hyper_ops(graph, bf16_stream=True)

    @jax.jit
    def g16_both(x):
        def loss(x):
            u, q, i = gather16(x)
            return (jnp.sum((u * u).astype(jnp.float32))
                    + jnp.sum((q * q).astype(jnp.float32))
                    + jnp.sum((i * i).astype(jnp.float32)))
        l, g = jax.value_and_grad(loss)(x)
        return x + 0 * g, l

    results["gather_fwdbwd_bf16_ms"] = timed(g16_both, x)
    print("gather_fwdbwd_bf16", results["gather_fwdbwd_bf16_ms"], flush=True)

    ef16 = ef.astype(jnp.bfloat16)

    @jax.jit
    def s16_both(ef):
        def loss(ef):
            return jnp.sum(scatter16(ef) ** 2)
        l, g = jax.value_and_grad(loss)(ef.astype(jnp.bfloat16))
        return ef + 0 * g.astype(ef.dtype), l

    results["scatter_fwdbwd_bf16_ms"] = timed(s16_both, ef16)
    print("scatter_fwdbwd_bf16", results["scatter_fwdbwd_bf16_ms"],
          flush=True)

    # --- full model fwd (conv features only, both layers)
    from ihgnn_tpu.models.rawgnn import RawGnn
    V = 100_000
    cfg = ModelConfig(embedding_size=D, gnn_layer_count=2,
                      feature_interaction_order=3)
    qw = jnp.asarray(rng.integers(1, V + 1, size=(Q, 4)).astype(np.int32))
    qc = jnp.full(Q, 4, jnp.int32)
    model = RawGnn(cfg=cfg, user_count=U, query_count=Q, item_count=I,
                   vocab_size=V)
    mparams = jax.jit(
        lambda k: model.init(k, graph, qw, qc, method=model.all_features)
    )(jax.random.key(1))

    def timed_m(model, iters=10):
        @jax.jit
        def m_fwd(mparams, graph, qw, qc, scale):
            feats = model.apply(mparams, graph, qw, qc,
                                method=model.all_features)
            s = sum(jnp.sum(f) for f in jax.tree.leaves(feats))
            return scale * (1 + 0 * s), s

        carry, s = m_fwd(mparams, graph, qw, qc, jnp.float32(1.0))
        _ = float(s)
        carry, s = m_fwd(mparams, graph, qw, qc, carry)
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            carry, s = m_fwd(mparams, graph, qw, qc, carry)
        _ = float(s)
        return (time.time() - t0) / iters * 1e3

    # --- X0 embedding assembly fwd+bwd (arange-gather tables + word-bag
    # mean): the backward is XLA scatter-adds into the tables — suspected
    # step-tail cost
    from ihgnn_tpu.models.embedding import EmbeddingTables
    emb = EmbeddingTables(user_count=U, item_count=I, vocab_size=V,
                          embedding_size=D)
    eparams = jax.jit(lambda k: emb.init(k, qw, qc,
                                         method=emb.all_features_t)
                      )(jax.random.key(2))

    @jax.jit
    def x0_both(eparams, qw, qc, scale):
        def loss(eparams):
            x_t = emb.apply(eparams, qw, qc, method=emb.all_features_t)
            return jnp.sum(x_t * x_t) * scale
        l, g = jax.value_and_grad(loss)(eparams)
        return l + 0 * sum(jnp.sum(x) for x in jax.tree.leaves(g))

    def timed_fn(fn, *args, iters=10):
        s = fn(*args, jnp.float32(1.0))
        _ = float(s)
        s = fn(*args, 1.0 + 0.0 * s)
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            s = fn(*args, 1.0 + 0.0 * s)
        _ = float(s)
        return (time.time() - t0) / iters * 1e3

    results["x0_embed_fwdbwd_ms"] = timed_fn(x0_both, eparams, qw, qc)
    print("x0_embed_fwdbwd", results["x0_embed_fwdbwd_ms"], flush=True)

    results["model_all_features_fwd_ms"] = timed_m(model)
    print("model_all_features_fwd", results["model_all_features_fwd_ms"], flush=True)

    # --- same forward with bf16 conv streams
    cfg16 = ModelConfig(embedding_size=D, gnn_layer_count=2,
                        feature_interaction_order=3, bf16_stream=True)
    model16 = RawGnn(cfg=cfg16, user_count=U, query_count=Q, item_count=I,
                     vocab_size=V)
    results["model_all_features_fwd_bf16_ms"] = timed_m(model16)
    print("model_all_features_fwd_bf16",
          results["model_all_features_fwd_bf16_ms"], flush=True)

    print(json.dumps(results))
    with open("/root/repo/docs/STEP_BREAKDOWN.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
