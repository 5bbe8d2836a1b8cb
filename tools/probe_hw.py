"""Measure the chip's actual streaming HBM bandwidth and MXU throughput.

All timing is amortized inside a single jitted ``lax.scan`` (one dispatch,
one scalar fetch), so remote-transport dispatch latency cannot inflate
per-iteration numbers the way per-call loops can (see CLAUDE.md).

Usage: python tools/probe_hw.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run(fn, x, iters, bytes_per_iter=None, flops_per_iter=None):
    @jax.jit
    def loop(x0):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(c[..., :4].astype(jnp.float32))

    s = loop(x)
    _ = float(s)                      # compile + warm
    t0 = time.time()
    _ = float(loop(x))
    dt = (time.time() - t0) / iters
    out = {"ms": round(dt * 1e3, 4)}
    if bytes_per_iter:
        out["gbps"] = round(bytes_per_iter / dt / 1e9, 1)
    if flops_per_iter:
        out["tflops"] = round(flops_per_iter / dt / 1e12, 2)
    return out


def main():
    dev = jax.devices()[0]
    results = {"platform": jax.default_backend(),
               "device": str(dev), "device_kind": dev.device_kind}

    # --- streaming copy bandwidth (read + write), f32 and bf16 ---
    for name, dtype, shape in [
            ("copy_f32_32x2M", jnp.float32, (32, 2_000_000)),
            ("copy_bf16_32x2M", jnp.bfloat16, (32, 2_000_000)),
            ("copy_f32_1Mx128", jnp.float32, (1_000_000, 128)),
    ]:
        x = jnp.ones(shape, dtype)
        nbytes = x.size * x.dtype.itemsize
        results[name] = run(lambda c: c * 1.0000001, x, 30,
                            bytes_per_iter=2 * nbytes)

    # --- MXU: big bf16 matmul (identifies chip generation) ---
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    results["matmul_bf16_4096"] = run(
        lambda c: (c @ a).astype(jnp.bfloat16) * (1.0 / m), a, 20,
        flops_per_iter=2 * m ** 3)

    # --- MXU f32 (default precision) ---
    af = jnp.ones((m, m), jnp.float32)
    results["matmul_f32_4096"] = run(
        lambda c: (c @ af) * (1.0 / m), af, 10,
        flops_per_iter=2 * m ** 3)

    # --- random row gather, amortized (vs kernel_check's per-call) ---
    import numpy as np
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 2_000_000, 2_000_000, dtype=np.int32))
    xf = jnp.ones((32, 2_000_000), jnp.float32)
    results["xla_gather_32x2M_f32"] = run(
        lambda c: c[:, idx] * 1.0000001, xf, 10,
        bytes_per_iter=2 * xf.size * 4)

    print(json.dumps(results, indent=1))
    with open("HW_PROBE.json", "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
