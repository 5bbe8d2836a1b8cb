"""Probe: per-op timing of the stress pack (cols=2048 σ grid, 10M edges)
on the real TPU — локализует the round-3 regression (6.5 s/step vs the
predicted ~0.8 s). Times gather fwd, scatter fwd, each chain stage kind,
and the segsum, amortized (scalar-fetch discipline)."""

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


def timed(fn, *args, iters=4):
    s = fn(*args, jnp.float32(1.0))
    _ = float(s)
    t0 = time.time()
    for _i in range(iters):
        s = fn(*args, 1.0 + 0.0 * s)
    _ = float(s)
    return (time.time() - t0) / iters * 1e3


def main():
    from ihgnn_tpu.ops.hyperagg import (_bt, _expand, _expand_t, _rlp,
                                        _rlp_bt, _segsum_regions)

    with open(CACHE, "rb") as f:
        graph, _ = pickle.load(f)
    kp = graph.kp
    D = 32
    R, C = kp.rows, kp.cols
    print(f"# rows={R} cols={C} e_pad={kp.e_pad} seg_block={kp.seg_block}",
          flush=True)
    for name, st in (("q.fwd_p1", kp.q.fwd_p1), ("q.inv_p1", kp.q.inv_p1),
                     ("i.fwd_p2", kp.i.fwd_p2), ("i.inv_p2", kp.i.inv_p2)):
        print(f"# {name}: kind={st.kind} w={st.w} shape={st.tab.shape}",
              flush=True)

    rng = np.random.default_rng(0)
    res = {}
    x = jnp.asarray(rng.standard_normal((D, kp.src_pad)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ef = jnp.asarray(rng.standard_normal((D, kp.e_pad)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    # individual stages
    @jax.jit
    def f_rlp_cr(ef, tab, scale):            # [C, R] stage (long rows)
        y = _rlp(ef.reshape(D, C, R) * scale, kp.q.fwd_p1)
        return jnp.sum(y[0, 0, :8].astype(jnp.float32))

    res["stage_CR_long_ms"] = timed(f_rlp_cr, ef, 0)
    print("stage_CR_long", res["stage_CR_long_ms"], flush=True)

    @jax.jit
    def f_rlp_rc(ef, scale):                 # [R, C] stage (hier)
        y = _rlp(ef.reshape(D, R, C) * scale, kp.i.fwd_p2)
        return jnp.sum(y[0, 0, :8].astype(jnp.float32))

    res["stage_RC_hier_ms"] = timed(f_rlp_rc, ef)
    print("stage_RC_hier", res["stage_RC_hier_ms"], flush=True)

    @jax.jit
    def f_bt(ef, scale):
        y = _bt(ef.reshape(D, R, C) * scale)
        return jnp.sum(y[0, 0, :8].astype(jnp.float32))

    res["bt_ms"] = timed(f_bt, ef)
    print("bt", res["bt_ms"], flush=True)

    @jax.jit
    def f_exp_u(x, scale):
        y = _expand(x * scale, kp.u_expand)
        return jnp.sum(y[0, :8].astype(jnp.float32))

    res["expand_u_ms"] = timed(f_exp_u, x)
    print("expand_u", res["expand_u_ms"], flush=True)

    @jax.jit
    def f_exp_t_q(x, scale):
        y = _expand_t(x * scale, kp.q.gather, R, C)
        return jnp.sum(y[0, 0, :8].astype(jnp.float32))

    res["expand_t_q_ms"] = timed(f_exp_t_q, x)
    print("expand_t_q", res["expand_t_q_ms"], flush=True)

    @jax.jit
    def f_seg(ef, scale):
        y = _segsum_regions(ef * scale, ef, ef, kp)
        return jnp.sum(y[0, :8])

    res["segsum_3regions_ms"] = timed(f_seg, ef)
    print("segsum_3regions", res["segsum_3regions_ms"], flush=True)

    print(json.dumps(res))
    with open("/root/repo/docs/STRESS_COMPONENTS.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__" and "--composed" not in sys.argv:
    main()


def composed():
    """Composed gather/scatter impls (baked pack) — discriminates
    composition overhead from arg-passing overhead."""
    from ihgnn_tpu.ops.hyperagg import _gather_impl, _scatter_impl

    with open(CACHE, "rb") as f:
        graph, _ = pickle.load(f)
    kp = graph.kp
    D = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D, kp.src_pad)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ef = jnp.asarray(rng.standard_normal((D, kp.e_pad)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    res = {}

    @jax.jit
    def f_gather(x, scale):
        u, q, i = _gather_impl(x * scale, kp)
        return (jnp.sum(u[0, :8].astype(jnp.float32))
                + jnp.sum(q[0, :8].astype(jnp.float32))
                + jnp.sum(i[0, :8].astype(jnp.float32)))

    res["gather_full_ms"] = timed(f_gather, x)
    print("gather_full", res["gather_full_ms"], flush=True)

    @jax.jit
    def f_scatter(ef, scale):
        y = _scatter_impl(ef * scale, kp)
        return jnp.sum(y[0, :8])

    res["scatter_full_ms"] = timed(f_scatter, ef)
    print("scatter_full", res["scatter_full_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__" and "--composed" in sys.argv:
    composed()
    sys.exit(0)
