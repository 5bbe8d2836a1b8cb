"""Probe: mask-store wide-block segsum vs per-sub-chunk path (round 4).

Measures csr_segment_sum3_t at the bench scatter shape (3 x E_pad bf16
streams, N=700k nodes) with IHGNN_SEGSUM_MASKSTORE taken from the
environment (the knob is read at trace time, so each setting runs in its
own process). Appends one JSON line to docs/SEGSUM_WIDE_PROBE.jsonl.

Run alone on the TPU: python tools/probe_segsum_wide.py
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

E = 2_000_000
N = 700_000
D = 32


def main():
    from ihgnn_tpu.ops.pallas.segsum import (
        BLOCK, pack_csr_tiles, _round_up)
    from ihgnn_tpu.ops.pallas import segsum

    rng = np.random.default_rng(0)
    e_pad = _round_up(E, BLOCK)
    ids = np.sort(rng.integers(0, N, 3 * e_pad)).astype(np.int32)
    tile_ptr, _ = pack_csr_tiles(ids, N)
    ids2d = jnp.asarray(ids.reshape(-1, 128))
    tp = jnp.asarray(tile_ptr)
    vu = jnp.asarray(rng.standard_normal((D, e_pad)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vq = vu * 0.5
    vi = vu * 0.25

    @jax.jit
    def run(vu, vq, vi, scale):
        s = (scale).astype(jnp.bfloat16)
        def body(c, _):
            out = segsum.csr_segment_sum3_t(vu * c, vq, vi, ids2d, tp, N,
                                            out_transposed=True)
            return s + 0 * jnp.sum(out[:, :8]).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, s, None, length=10)
        return c

    _ = float(run(vu, vq, vi, jnp.float32(1.0)))
    t0 = time.time()
    _ = float(run(vu, vq, vi, jnp.float32(1.0)))
    per_call = (time.time() - t0) / 10 * 1e3

    rec = {
        "maskstore": os.environ.get("IHGNN_SEGSUM_MASKSTORE", "1"),
        "entries": int(3 * e_pad),
        "segsum3_ms": round(per_call, 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))
    with open("/root/repo/docs/SEGSUM_WIDE_PROBE.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
