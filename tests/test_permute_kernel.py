"""Pallas Beneš stage kernels (prototype) — interpreter-mode correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from ihgnn_tpu.ops.benes import benes_route
from ihgnn_tpu.ops.pallas.permute import (benes_permute, block_transpose,
                                          row_local_permute)


@pytest.mark.parametrize("s,d", [(8, 8), (16, 32)])
def test_benes_permute_matches_gather(s, d):
    rng = np.random.default_rng(s)
    perm = rng.permutation(s * s)
    p0, p1, p2 = benes_route(perm, s)
    x = jnp.asarray(rng.standard_normal((d, s * s)).astype(np.float32))
    out = benes_permute(x, *(jnp.asarray(p.astype(np.int32))
                             for p in (p0, p1, p2)), interpret=True)
    ref = np.asarray(x)[:, perm]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_block_transpose():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 16)).astype(np.float32))
    out = block_transpose(x, tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.swapaxes(np.asarray(x), 1, 2))


def test_row_local_permute():
    rng = np.random.default_rng(1)
    s, d = 16, 8
    p = np.stack([rng.permutation(s) for _ in range(s)]).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((d, s, s)).astype(np.float32))
    out = np.asarray(row_local_permute(x, jnp.asarray(p), interpret=True))
    ref = np.take_along_axis(np.asarray(x), p[None], axis=2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
