"""Hyperedge feature interaction — the "I" in IHGNN.

Per hyperedge e = (u, q, i), builds interaction features from the endpoint
node embeddings and projects with a single Linear
(Models/CommonLayers.py:29-87):

  order 1: [u, q, i]                          → Linear(3d, out)
  order 2: [u, q, i, u⊙q, q⊙i, i⊙u]           → Linear(6d, out)
  order 3: order 2 + [u⊙q⊙i]                  → Linear(7d, out)

Feature-major and memory-lean: the gathered endpoints arrive as [d, 3E]
(role-major columns) and the projection is computed as a SUM of per-part
matmuls  Σ_k W[kd:(k+1)d]ᵀ · part_k  — mathematically identical to
Linear(concat(parts)) but the [kd, E] concat (8.3 GB at the 10M-edge
stress scale) is never materialized. The parameter tree matches a plain
Linear ("aggregation"/dense/kernel [kd, out] + bias), so checkpoints are
identical either way.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ihgnn_tpu.models.initializers import torch_linear_bias, torch_linear_kernel


class _SplitDenseT(nn.Module):
    """Linear over implicitly-concatenated feature-major parts."""

    features: int
    in_features: int
    part_dim: int

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        kernel = self.param("kernel", torch_linear_kernel(),
                            (self.in_features, self.features))
        bias = self.param("bias", torch_linear_bias(self.in_features),
                          (self.features,))
        out = None
        for j, part in enumerate(parts):
            kj = kernel[j * self.part_dim:(j + 1) * self.part_dim, :]
            # bf16 streams: cast the weight slice to the stream dtype (the
            # MXU rounds f32 operands to bf16 at default precision anyway)
            y = jax.lax.dot_general(kj.astype(part.dtype), part,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = y if out is None else out + y
        return out + bias[:, None]


class _Aggregation(nn.Module):
    features: int
    in_features: int
    part_dim: int

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        return _SplitDenseT(self.features, self.in_features, self.part_dim,
                            name="dense")(parts)


class _DenseParams(nn.Module):
    """Bare Linear parameters — same names/shapes/init as _SplitDenseT so
    the fused and fallback interaction paths share checkpoints."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel(),
                            (self.in_features, self.features))
        bias = self.param("bias", torch_linear_bias(self.in_features),
                          (self.features,))
        return kernel, bias


class _FusedAggregation(nn.Module):
    """Same params as _Aggregation, applied through the fused Pallas
    interaction kernel (ops/pallas/interact.py) — the hadamard parts are
    never materialized in HBM. With ``mesh`` set, the kernel runs
    per-shard under shard_map (edge axis on 'data')."""

    features: int
    in_features: int
    order: int

    @nn.compact
    def __call__(self, u, q, i, mesh=None, absorb=None):
        from ihgnn_tpu.ops.pallas.interact import (fused_interaction,
                                                   fused_interaction_absorb,
                                                   fused_interaction_sharded)

        kernel, bias = _DenseParams(self.features, self.in_features,
                                    name="dense")()
        if mesh is not None:
            return fused_interaction_sharded(u, q, i, kernel, bias[:, None],
                                             self.order, mesh)
        if absorb is not None:
            pi, rho, mask, cols = absorb
            return fused_interaction_absorb(u, q, i, kernel, bias[:, None],
                                            pi, rho, mask, self.order, cols)
        return fused_interaction(u, q, i, kernel, bias[:, None],
                                 self.order)


class FeatureInteractor(nn.Module):
    max_order: int          # 1, 2 or 3
    feature_dim: int        # d of the (already transformed) node features
    output_dim: int

    @nn.compact
    def __call__(self, roles_t, fused_ok: bool = False,
                 mesh=None, absorb=None):
        """roles_t: 3-tuple (u, q, i) of [d, E] gathered endpoints in edge
        order → [out, E] edge features.

        ``fused_ok`` is set by the caller when the edge arrays are whole
        on one device (the single-chip Pallas path). ``mesh``: the edge
        axis is GSPMD-sharded over the mesh 'data' axis — the fused kernel
        then runs per-shard under shard_map (a naked pallas_call must not
        see sharded operands). ``absorb``: (pi, rho, sig_mask, cols) for
        the absorbed i-role final stage (ops/pallas/interact.py) — the i
        input is then t1-ordered and TWO outputs (o1, o2) are returned."""
        from ihgnn_tpu.ops.hyperagg import _kernels_active
        from ihgnn_tpu.ops.pallas.interact import BLK, ORDER_PARTS

        d = self.feature_dim
        u, q, i = roles_t[0], roles_t[1], roles_t[2]
        n_parts = ORDER_PARTS[self.max_order]

        if absorb is not None:
            return _FusedAggregation(
                self.output_dim, n_parts * d, self.max_order,
                name="aggregation")(u, q, i, absorb=absorb)

        if mesh is not None:
            return _FusedAggregation(
                self.output_dim, n_parts * d, self.max_order,
                name="aggregation")(u, q, i, mesh=mesh)

        if fused_ok and _kernels_active() and u.shape[1] % BLK == 0:
            # param name nesting matches the fallback ("aggregation"/
            # "dense"/kernel+bias), so the two paths share checkpoints
            return _FusedAggregation(
                self.output_dim, n_parts * d, self.max_order,
                name="aggregation")(u, q, i)

        if self.max_order == 1:
            parts = [u, q, i]
        else:
            uq, qi, iu = u * q, q * i, i * u
            parts = [u, q, i, uq, qi, iu]
            if self.max_order == 3:
                parts.append(uq * i)
        return _Aggregation(self.output_dim, n_parts * d, d,
                            name="aggregation")(parts)
