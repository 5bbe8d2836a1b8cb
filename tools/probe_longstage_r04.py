"""Probe: the flat int8 long-row stage at the PRODUCTION stress shape
[32, 1024, 9856] bf16 — isolated, args-passed (no HLO-baked constants),
scan-amortized. Round-4 stress accounting measured the composed
sig_inverse (bt + int8 rlp + bt) at 555 ms/call while round-3 notes claim
26.1 ms/pass for the rlp alone at this exact shape; this probe decides
whether the kernel is slow in isolation today or only in composition.

Writes docs/LONGSTAGE_R04.json. Run alone on the TPU.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

D, R, C = 32, 1024, 9856


def timed(fn, *args, iters=5):
    @jax.jit
    def loop(*a):
        def body(c, _):
            return fn(*a, 1.0 + 0.0 * c), None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c
    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return round((time.time() - t0) / iters * 1e3, 2)


def main():
    from ihgnn_tpu.ops.pallas.permute import (block_transpose,
                                              row_local_permute_int8)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D, R, C))).astype(jnp.bfloat16)
    # one real permutation per row (the routed stage tables are
    # permutations; a broadcast iota would let XLA fold the compare)
    p = np.empty((R, C), np.int32)
    base = np.arange(C)
    for r in range(R):
        np.random.default_rng(r).shuffle(base)
        p[r] = base
    pj = jnp.asarray(p)

    res = {"shape": f"d={D} r={R} c={C} bf16"}

    @jax.jit
    def rlp_i8(x, pj, scale):
        out = row_local_permute_int8(
            (x.reshape(D, -1) * scale.astype(jnp.bfloat16)
             ).reshape(D, R, C), pj)
        return jnp.sum(out[:, :2, :8].astype(jnp.float32))

    res["int8_rlp_ms"] = timed(rlp_i8, x, pj)
    print("int8_rlp", res["int8_rlp_ms"], flush=True)

    @jax.jit
    def bt_only(x, scale):
        out = block_transpose(
            (x.reshape(D, -1) * scale.astype(jnp.bfloat16)
             ).reshape(D, R, C))
        return jnp.sum(out[:, :2, :8].astype(jnp.float32))

    res["bt_ms"] = timed(bt_only, x)
    print("bt", res["bt_ms"], flush=True)

    print(json.dumps(res, indent=1))
    with open("/root/repo/docs/LONGSTAGE_R04.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
