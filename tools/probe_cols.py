"""Probe: Clos routing column-width sweep on the real TPU.

The row-local permute's one-hot matmul costs ∝ cols per entry (MXU-bound)
while the windowed expansion is DMA-latency-bound and now runs on fixed
EXPAND_COLS-wide rows regardless — so smaller routing cols should cut the
permutation stages without hurting the expansion. Times the full gather
fwd and fwd+bwd at cols ∈ {1024, 512, 256}, f32 and bf16.

Run on the real TPU to natural completion, one process at a time.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, arg, iters=10):
    carry, s = fn(arg)
    _ = float(s)
    carry, s = fn(carry)
    _ = float(s)
    t0 = time.time()
    for _ in range(iters):
        carry, s = fn(carry)
    _ = float(s)
    return (time.time() - t0) / iters * 1e3


def main():
    from ihgnn_tpu.ops.hyperagg import _gather_roles_pallas
    from ihgnn_tpu.ops.packing import build_hyper_kernel_pack

    E, D = 2_000_000, 32
    U, Q, I = 200_000, 100_000, 400_000
    n = U + Q + I
    rng = np.random.default_rng(0)
    i3 = np.stack([
        np.sort(rng.integers(0, U, E)),
        rng.integers(U, U + Q, E),
        rng.integers(U + Q, n, E),
    ], axis=1).astype(np.int64)
    x = rng.standard_normal((D, n)).astype(np.float32)

    results = {}
    for cols in (1024, 512, 256):
        t0 = time.time()
        kp = build_hyper_kernel_pack(i3, n, cols=cols)
        print(f"# cols={cols} packed in {time.time()-t0:.1f}s "
              f"rows={kp.rows} e_pad={kp.e_pad}", flush=True)
        for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            x_pad = jnp.asarray(
                np.pad(x, ((0, 0), (0, kp.src_pad - n)))).astype(dt)

            @jax.jit
            def g_fwd(x_pad, kp=kp):
                u, q, i = _gather_roles_pallas(x_pad, kp)
                s = (jnp.sum(u.astype(jnp.float32))
                     + jnp.sum(q.astype(jnp.float32))
                     + jnp.sum(i.astype(jnp.float32)))
                return x_pad * (1 + 0 * s).astype(dt), s

            @jax.jit
            def g_both(x_pad, kp=kp):
                def loss(x_pad):
                    u, q, i = _gather_roles_pallas(x_pad, kp)
                    return (jnp.sum(u.astype(jnp.float32) ** 2)
                            + jnp.sum(q.astype(jnp.float32) ** 2)
                            + jnp.sum(i.astype(jnp.float32) ** 2))
                l, g = jax.value_and_grad(loss)(x_pad)
                return x_pad + (0 * g).astype(dt), l

            results[f"gather_fwd_c{cols}_{name}_ms"] = timed(g_fwd, x_pad)
            print(f"gather_fwd cols={cols} {name}:",
                  results[f"gather_fwd_c{cols}_{name}_ms"], flush=True)
            results[f"gather_fwdbwd_c{cols}_{name}_ms"] = timed(g_both, x_pad)
            print(f"gather_fwdbwd cols={cols} {name}:",
                  results[f"gather_fwdbwd_c{cols}_{name}_ms"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
