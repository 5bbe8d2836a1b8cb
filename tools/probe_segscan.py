"""On-chip A/B: one-hot MXU segment-sum vs scan+place (VPU) segment-sum
at the bench incidence scale. Amortized lax.scan timing (one dispatch).
Run on the real TPU, single process, natural completion (CLAUDE.md)."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def amortized(make_step, x0, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(c, _):
            return make_step(c)
        c, s = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(s[-1])

    _ = float(loop(x0))
    t0 = time.time()
    _ = float(loop(x0))
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_graph
    from ihgnn_tpu.ops.pallas.segscan import (csr_segment_scan_t,
                                              pack_scan_inputs)
    from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t

    E, D = 2_000_000, 32
    U, Q, I = 200_000, 100_000, 400_000
    print("# building graph...", flush=True)
    graph, _ = build_bench_graph(U, Q, I, E)
    kp = graph.kp
    ids = np.asarray(kp.ids2d).reshape(-1)
    k_pad = ids.shape[0]
    n = kp.n
    print(f"# packing scan words (k={k_pad})...", flush=True)
    t0 = time.time()
    pack = pack_scan_inputs(ids, n)
    print(f"# packed in {time.time() - t0:.1f}s; word blocks "
          f"{pack.w1.shape[0] // 8} vs value blocks {k_pad // 1024}",
          flush=True)

    rng = np.random.default_rng(0)
    for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        vals = jnp.asarray(
            rng.standard_normal((D, k_pad)).astype(np.float32)).astype(dt)

        def ss(v):
            out = csr_segment_sum_t(v, kp.ids2d, kp.tile_ptr, n,
                                    out_transposed=True)
            s = out[0, :1]
            return v * (1 + 0 * s[0]).astype(v.dtype), s

        ms = amortized(ss, vals)
        print(f"segsum_onehot_{tag}_ms {ms:.3f}", flush=True)

        def sc(v):
            out = csr_segment_scan_t(v, pack, n)
            s = out[0, :1]
            return v * (1 + 0 * s[0]).astype(v.dtype), s

        ms = amortized(sc, vals)
        print(f"segscan_{tag}_ms {ms:.3f}", flush=True)

        # parity on-chip
        o1 = csr_segment_sum_t(vals, kp.ids2d, kp.tile_ptr, n,
                               out_transposed=True)
        o2 = csr_segment_scan_t(vals, pack, n)
        err = float(jnp.max(jnp.abs(o1 - o2)))
        print(f"parity_{tag} max|diff| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
