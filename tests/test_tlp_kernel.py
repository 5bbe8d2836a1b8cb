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


def test_tlp_plan_selection():
    from ihgnn_tpu.ops.pallas.permute import _tlp_plan
    # the bench default (d=32, C=1024, both dtypes) double-buffers under
    # the raised vmem_limit_bytes budget
    assert _tlp_plan(32, 1024, jnp.bfloat16) == "auto"
    assert _tlp_plan(32, 1024, jnp.float32) == "auto"
    # a 64 MB x tile exceeds half the budget → manual single-buffered DMA
    assert _tlp_plan(32, 8192, jnp.bfloat16) == "hbm"
    # 128 MB exceeds even the single-buffered budget
    assert _tlp_plan(32, 16384, jnp.bfloat16) is None


def test_tlp_hbm_variant():
    """Shape that selects the manual-DMA (single-buffered x) variant."""
    rng = np.random.default_rng(2)
    d, r, c = 2, 128, 8192
    x = jnp.asarray(rng.standard_normal((d, r, c))).astype(jnp.bfloat16)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    from ihgnn_tpu.ops.pallas.permute import _tlp_plan
    import ihgnn_tpu.ops.pallas.permute as pm
    orig = pm._TLP_BUDGET
    pm._TLP_BUDGET = 8 << 20        # shrink so this small shape picks hbm
    try:
        assert _tlp_plan(d, c, x.dtype) == "hbm"
        out = np.asarray(transposed_local_permute(
            x, jnp.asarray(p), interpret=True)).astype(np.float32)
    finally:
        pm._TLP_BUDGET = orig
    np.testing.assert_array_equal(out, _ref(np.asarray(x, np.float32), p))


def test_tlp_hier_matches_reference():
    """Fused hier TLP == transpose(hier rlp) == take_along_axis reference."""
    from ihgnn_tpu.ops.benes import route_rows_hier, unpack_hier_rows
    from ihgnn_tpu.ops.pallas.permute import (tlp_hier_ok,
                                              transposed_local_permute_hier)
    rng = np.random.default_rng(3)
    d, r, c = 8, 256, 256                      # b = 2 blocks of W=128
    assert tlp_hier_ok(d, r, c, jnp.float32)
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    p = np.stack([rng.permutation(c) for _ in range(r)])
    packed = route_rows_hier(p)
    full = unpack_hier_rows(packed)
    np.testing.assert_array_equal(full, p)
    out = np.asarray(transposed_local_permute_hier(
        jnp.asarray(x), jnp.asarray(packed), interpret=True))
    np.testing.assert_allclose(out, _ref(x, p.astype(np.int32)),
                               rtol=1e-4, atol=1e-4)


def test_tlp_hier_bf16_exact_wide():
    """bf16, b=8 blocks (the bench C=1024 shape class, scaled down rows)."""
    from ihgnn_tpu.ops.benes import route_rows_hier
    from ihgnn_tpu.ops.pallas.permute import transposed_local_permute_hier
    rng = np.random.default_rng(4)
    d, r, c = 4, 128, 1024
    x = jnp.asarray(rng.standard_normal((d, r, c))).astype(jnp.bfloat16)
    p = np.stack([rng.permutation(c) for _ in range(r)])
    packed = route_rows_hier(p)
    out = np.asarray(transposed_local_permute_hier(
        x, jnp.asarray(packed), interpret=True)).astype(np.float32)
    np.testing.assert_array_equal(
        out, _ref(np.asarray(x, np.float32), p.astype(np.int32)))


def test_tlp_bfly_matches_reference():
    """Fused butterfly TLP == transpose(permute) == take_along_axis."""
    from ihgnn_tpu.ops.bfly import route_rows_bfly
    from ihgnn_tpu.ops.pallas.permute import (transposed_local_permute_bfly,
                                              unpack_bfly_perm)
    rng = np.random.default_rng(5)
    d, r, c = 8, 128, 256
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    p = np.stack([rng.permutation(c) for _ in range(r)])
    words = route_rows_bfly(p)
    np.testing.assert_array_equal(np.asarray(unpack_bfly_perm(
        jnp.asarray(words))), p)
    out = np.asarray(transposed_local_permute_bfly(
        jnp.asarray(x), jnp.asarray(words), interpret=True))
    np.testing.assert_array_equal(out, _ref(x, p.astype(np.int32)))


def test_tlp_dg_pre_matches_reference():
    """Fused bt+tlp_dg (transposed-input DMA, permute.py
    _tlp_dg_pre_kernel): out[:, r, c] == x[:, perm[c, r], c] — the
    _sig_inverse composition without the standalone block_transpose."""
    from ihgnn_tpu.ops.benes import route_rows_hier
    from ihgnn_tpu.ops.pallas.permute import (DG_W, tlp_dg_pre_ok,
                                              transposed_local_permute_dg_pre)
    rng = np.random.default_rng(6)
    d, r, c = 32, 512, 256                    # permute rows length r (B=4)
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    perm = np.stack([rng.permutation(r) for _ in range(c)])       # [c, r]
    packed = route_rows_hier(perm, DG_W)
    assert tlp_dg_pre_ok(d, r, c, jnp.float32)
    ref = np.empty((d, r, c), np.float32)
    for cc in range(c):
        ref[:, :, cc] = x[:, perm[cc], cc]
    for dt in (jnp.float32, jnp.bfloat16):
        xd = jnp.asarray(x).astype(dt)
        out = np.asarray(transposed_local_permute_dg_pre(
            xd, jnp.asarray(packed), interpret=True), np.float32)
        np.testing.assert_array_equal(
            out, np.asarray(jnp.asarray(ref).astype(dt), np.float32))
