"""Hyperedge feature interaction — the "I" in IHGNN.

Per hyperedge e = (u, q, i), builds interaction features from the endpoint
node embeddings and projects with a single Linear
(Models/CommonLayers.py:29-87):

  order 1: [u, q, i]                          → Linear(3d, out)
  order 2: [u, q, i, u⊙q, q⊙i, i⊙u]           → Linear(6d, out)
  order 3: order 2 + [u⊙q⊙i]                  → Linear(7d, out)

On TPU this is one [E, 3, d] gather (MXU-adjacent bandwidth), a few VPU
Hadamard products, and one [E, kd]×[kd, out] matmul — XLA fuses the
concatenation into the GEMM. The Pallas backend fuses gather+cross+project
into a single kernel for the hot path.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ihgnn_tpu.models.common import TorchDense


class FeatureInteractor(nn.Module):
    max_order: int          # 1, 2 or 3
    feature_dim: int        # d of the (already transformed) node features
    output_dim: int

    @nn.compact
    def __call__(self, uqi: jnp.ndarray) -> jnp.ndarray:
        """uqi: [E, 3, d] gathered endpoint rows → [E, out]. (The gather is
        done by the caller through ops.hyperagg so its VJP uses the Pallas
        segment-sum kernel.)"""
        d = self.feature_dim
        if self.max_order == 1:
            feats = uqi.reshape(-1, 3 * d)
            width = 3 * d
        else:
            u, q, i = uqi[:, 0], uqi[:, 1], uqi[:, 2]
            uq, qi, iu = u * q, q * i, i * u
            parts = [u, q, i, uq, qi, iu]
            if self.max_order == 3:
                parts.append(uq * i)
            feats = jnp.concatenate(parts, axis=1)
            width = len(parts) * d
        return TorchDense(self.output_dim, width, name="aggregation")(feats)
