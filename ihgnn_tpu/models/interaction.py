"""Hyperedge feature interaction — the "I" in IHGNN.

Per hyperedge e = (u, q, i), builds interaction features from the endpoint
node embeddings and projects with a single Linear
(Models/CommonLayers.py:29-87):

  order 1: [u, q, i]                          → Linear(3d, out)
  order 2: [u, q, i, u⊙q, q⊙i, i⊙u]           → Linear(6d, out)
  order 3: order 2 + [u⊙q⊙i]                  → Linear(7d, out)

Feature-major: the gathered endpoints arrive as [d, 3E] (role-major
columns); the cross features concatenate along the feature (sublane) axis
into [kd, E] and the projection is one MXU matmul [out, kd] × [kd, E] —
no lane padding anywhere (E is the 128-lane axis).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ihgnn_tpu.models.common import TorchDenseT


class FeatureInteractor(nn.Module):
    max_order: int          # 1, 2 or 3
    feature_dim: int        # d of the (already transformed) node features
    output_dim: int

    @nn.compact
    def __call__(self, roles_t: jnp.ndarray) -> jnp.ndarray:
        """roles_t: [d, 3E] gathered endpoint columns (u | q | i role-major)
        → [out, E] edge features."""
        d = self.feature_dim
        e = roles_t.shape[1] // 3
        u, q, i = roles_t[:, :e], roles_t[:, e:2 * e], roles_t[:, 2 * e:]
        if self.max_order == 1:
            parts = [u, q, i]
        else:
            uq, qi, iu = u * q, q * i, i * u
            parts = [u, q, i, uq, qi, iu]
            if self.max_order == 3:
                parts.append(uq * i)
        feats_t = jnp.concatenate(parts, axis=0)           # [kd, E]
        return TorchDenseT(self.output_dim, len(parts) * d,
                           name="aggregation")(feats_t)
