"""Fused transposed-local-permute kernel — interpreter-mode correctness."""

import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.ops.pallas.permute import transposed_local_permute


def _ref(x, p):
    y = np.take_along_axis(x, p[None], axis=2)
    return np.swapaxes(y, 1, 2)


def test_tlp_matches_rlp_then_transpose():
    rng = np.random.default_rng(0)
    d, r, c = 8, 256, 256
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    out = np.asarray(transposed_local_permute(
        jnp.asarray(x), jnp.asarray(p), interpret=True))
    np.testing.assert_allclose(out, _ref(x, p), rtol=1e-4, atol=1e-4)


def test_tlp_bf16_exact():
    rng = np.random.default_rng(1)
    d, r, c = 8, 128, 384
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    out = np.asarray(transposed_local_permute(
        xb, jnp.asarray(p), interpret=True)).astype(np.float32)
    # a permutation of bf16 values is exact
    np.testing.assert_array_equal(out, _ref(np.asarray(xb, np.float32), p))
