"""Pallas Clos/Beneš permutation kernels — interpreter-mode correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from ihgnn_tpu.ops.pallas.permute import (benes_permute, block_transpose,
                                          make_plan, pick_grid,
                                          row_local_permute)


@pytest.mark.parametrize("e,c", [(16384, 128), (300, 128)])
def test_benes_permute_matches_gather(e, c):
    """Full pipeline: host routing (native lib or NumPy fallback) + the
    three Pallas stages reproduce x[:, perm], incl. the padded-tail case."""
    rng = np.random.default_rng(e)
    perm = rng.permutation(e)
    plan = make_plan(perm, c=c)
    e_pad = plan.rows * plan.cols
    d = 8
    x = rng.standard_normal((d, e_pad)).astype(np.float32)
    out = benes_permute(jnp.asarray(x), plan, interpret=True)
    ref = np.concatenate([x[:, :e][:, perm], x[:, e:]], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_pick_grid_shapes():
    r, c = pick_grid(2_000_000, 1024)
    assert c == 1024 and r % 128 == 0 and r * c >= 2_000_000
    r, c = pick_grid(300, 1024)
    assert c == 128 and r == 128


def test_block_transpose_rect():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 24)).astype(np.float32))
    out = block_transpose(x, tile=8, interpret=True)
    assert out.shape == (4, 24, 16)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.swapaxes(np.asarray(x), 1, 2))


def test_row_local_permute_rect():
    rng = np.random.default_rng(1)
    d, r, c = 8, 16, 128
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((d, r, c)).astype(np.float32))
    out = np.asarray(row_local_permute(x, jnp.asarray(p), interpret=True))
    ref = np.take_along_axis(np.asarray(x), p[None], axis=2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
