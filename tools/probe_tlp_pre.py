"""Probe: fused bt+tlp_dg (_tlp_dg_pre_kernel) vs the bt + tlp_dg pair
for the _sig_inverse composition at the bench shape (round 4).

IHGNN_TLP_PRE is read at trace time — run once with =0 and once with =1
(separate processes). The =1 run also checks bit-parity against the pair.
Appends one JSON line per run to docs/TLP_PRE_PROBE.jsonl.

Run alone on the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

E, D = 2_000_000, 32
U, Q, I = 200_000, 100_000, 400_000


def main():
    from bench import build_bench_graph
    from ihgnn_tpu.ops.hyperagg import _sig_inverse

    setting = os.environ.get("IHGNN_TLP_PRE", "1")
    graph, _ = build_bench_graph(U, Q, I, E)
    kp = graph.kp
    rng = np.random.default_rng(0)
    ef = jnp.asarray(rng.standard_normal((D, kp.e_pad))).astype(jnp.bfloat16)

    @jax.jit
    def run(ef, scale):
        s = scale.astype(jnp.bfloat16)

        def body(c, _):
            out = _sig_inverse(ef * c, kp.q, kp.rows, kp.cols)
            return s + 0 * jnp.sum(out[:, :8]).astype(jnp.bfloat16), None

        c, _ = jax.lax.scan(body, s, None, length=10)
        return c

    _ = float(run(ef, jnp.float32(1.0)))
    t0 = time.time()
    _ = float(run(ef, jnp.float32(1.0)))
    per_call = (time.time() - t0) / 10 * 1e3

    rec = {
        "tlp_pre": setting,
        "sig_inverse_q_ms": round(per_call, 3),
        "platform": jax.devices()[0].platform,
    }
    if setting == "1":
        from ihgnn_tpu.ops.pallas.permute import (
            block_transpose, transposed_local_permute_dg)
        out_new = _sig_inverse(ef, kp.q, kp.rows, kp.cols)
        g = ef.reshape(D, kp.rows, kp.cols)
        ref = transposed_local_permute_dg(
            block_transpose(g), kp.q.inv_p1.tab).reshape(D, -1)
        rec["max_err_vs_pair"] = float(jnp.max(jnp.abs(
            out_new.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(json.dumps(rec))
    with open("/root/repo/docs/TLP_PRE_PROBE.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
