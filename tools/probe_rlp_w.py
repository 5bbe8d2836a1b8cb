"""Probe: hier row-local permute at W ∈ {128, 256, 512} vs flat, on the
bench stage shape ([32, 2048, 1024]) and the transposed orientation
([32, 1024, 2048]) — amortized lax.scan timing (probe_kernels_amortized
discipline). Decides packing.HIER_W_PREF.

Hypothesis (STEP_ACCOUNTING round 3): the stage kernels are
matmul-issue/VPU-bound, not MXU-weight-load-bound — the windowed expand
does the same weight volume as hier-128 in ONE one-hot level per chunk at
1.27 ms vs hier's 2.52. Wider W halves the matmul count and the exchange
chain at 2x the one-hot depth.
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from probe_kernels_amortized import amortized  # noqa: E402


def main():
    from ihgnn_tpu.ops.benes import hier_eligible, route_rows_hier
    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.pallas.permute import (row_local_permute,
                                              row_local_permute_hier)

    D = 32
    rng = np.random.default_rng(0)
    results = {}

    for (r, c) in [(2048, 1024), (1024, 2048)]:
        perms = np.stack([rng.permutation(c) for _ in range(r)]
                         ).astype(np.int32)
        x = jnp.asarray(rng.standard_normal((D, r, c))).astype(jnp.bfloat16)

        for w in (128, 256, 512):
            if not hier_eligible(c, w):
                continue
            packed = native.route_rows_hier(perms, w)
            if packed is None:
                packed = route_rows_hier(perms, w)
            packed = jnp.asarray(packed)

            def step(xc, p, w=w):
                y = row_local_permute_hier(xc, p, w=w)
                return y, jnp.sum(y[0, 0, :8].astype(jnp.float32))

            ms = amortized(step, x, aux=(packed,))
            key = f"rlp_hier_w{w}_{r}x{c}_bf16_ms"
            results[key] = round(ms, 3)
            print(key, results[key], flush=True)

        pf = jnp.asarray(perms)

        def step_flat(xc, p):
            y = row_local_permute(xc, p)
            return y, jnp.sum(y[0, 0, :8].astype(jnp.float32))

        key = f"rlp_flat_{r}x{c}_bf16_ms"
        results[key] = round(amortized(step_flat, x, aux=(pf,)), 3)
        print(key, results[key], flush=True)

    print(json.dumps(results))
    with open("/root/repo/docs/RLP_W_PROBE.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
