"""Pallas Clos/Beneš permutation kernels — interpreter-mode correctness."""

import numpy as np
import pytest

import jax.numpy as jnp

from ihgnn_tpu.ops.benes import (apply_hier_rows, hier_eligible,
                                 route_rows_hier, unpack_hier_rows)
from ihgnn_tpu.ops.pallas.permute import (benes_permute, block_transpose,
                                          make_plan, pick_grid,
                                          row_local_permute,
                                          row_local_permute_hier,
                                          unpack_hier_perm)


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


# ---------------------------------------------------------------------------
# hierarchical (second-level Clos) in-row tables
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("length", [256, 512, 2048])
def test_route_rows_hier_roundtrip(length):
    """Oracle and native routing both pack stage words that unpack back to
    the original per-row permutations, and the staged NumPy execution
    reproduces the direct gather."""
    from ihgnn_tpu.ops import native
    rng = np.random.default_rng(length)
    nr = 5
    perms = np.stack([rng.permutation(length) for _ in range(nr)])
    assert hier_eligible(length)
    for packed in filter(
            lambda p: p is not None,
            [route_rows_hier(perms),
             native.route_rows_hier(perms.astype(np.int32), 128)]):
        assert (unpack_hier_rows(packed) == perms).all()
        x = rng.standard_normal((nr, length, 3)).astype(np.float32)
        out = apply_hier_rows(x, packed)
        ref = np.take_along_axis(x, perms[:, :, None], axis=1)
        np.testing.assert_array_equal(out, ref)


def test_hier_eligible_bounds():
    assert not hier_eligible(128)          # B == 1: flat kernel is fine
    assert hier_eligible(256) and hier_eligible(2048)
    # B > 16 stays on the flat kernel: the big-B select-chain exchange
    # measured 83 vs 47 ms/pass at B=77 (O(B^2) VMEM traffic) — the
    # kernel itself remains available and tested below
    assert not hier_eligible(4096)
    assert not hier_eligible(300)          # not a multiple of W


def test_row_local_permute_hier_big_b():
    """The fori-structured big-B kernel (17 <= B <= 128) matches the
    direct gather in interpret mode."""
    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.benes import route_rows_hier
    rng = np.random.default_rng(11)
    d, r, c = 4, 16, 128 * 20               # B = 20 > 16
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    packed = native.route_rows_hier(p, 128)
    if packed is None:
        packed = route_rows_hier(p, 128)
    out = np.asarray(row_local_permute_hier(
        jnp.asarray(x), jnp.asarray(packed), interpret=True))
    np.testing.assert_allclose(out, np.take_along_axis(x, p[None], axis=2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_row_local_permute_hier_kernel(dtype):
    """Two-level Pallas kernel matches the direct row-local gather; bf16
    selection is bit-exact, f32 rides the hi/lo split (~1e-4)."""
    rng = np.random.default_rng(2)
    d, r, c = 8, 16, 512
    perms = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    packed = jnp.asarray(route_rows_hier(perms))
    assert np.array_equal(np.asarray(unpack_hier_perm(packed)), perms)
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    ref = np.take_along_axis(x.astype(np.float32), perms[None], axis=2)
    if dtype == jnp.bfloat16:
        xj = jnp.asarray(x, jnp.bfloat16)
        ref = np.take_along_axis(np.asarray(xj, np.float32), perms[None],
                                 axis=2)
        out = row_local_permute_hier(xj, packed, interpret=True)
        np.testing.assert_array_equal(np.asarray(out, np.float32), ref)
    else:
        out = row_local_permute_hier(jnp.asarray(x), packed, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_rlp_long_rows_f32_shrinks_blocks():
    """Stress-shape guard: long rows shrink the f32 block row count and the
    kernel still matches take_along_axis (interpret mode)."""
    import jax.numpy as jnp
    from ihgnn_tpu.ops.pallas.permute import _rlp_rows, row_local_permute
    d, r, c = 4, 16, 4096
    assert _rlp_rows(32, 2048, 9856, jnp.float32) == 8
    rng = np.random.default_rng(9)
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    out = np.asarray(row_local_permute(jnp.asarray(x), jnp.asarray(p),
                                       interpret=True))
    np.testing.assert_allclose(out, np.take_along_axis(x, p[None], axis=2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_row_local_permute_int8_exact(dtype):
    """Long-row byte-plane kernel: EXACT bit transport (incl. NaN/inf/-0)
    for both the 2-plane bf16 and 4-plane f32 packings."""
    from ihgnn_tpu.ops.pallas.permute import int8_rlp_ok, row_local_permute_int8
    rng = np.random.default_rng(7)
    d, r, c = 8, 16, 2304                   # c > 2048 = the long-row gate
    assert int8_rlp_ok(d, r, c, dtype)
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    x.reshape(-1)[::97] = np.nan            # byte transport must keep bits
    x.reshape(-1)[5::191] = np.inf
    x.reshape(-1)[11::191] = -0.0
    xj = jnp.asarray(x).astype(dtype)
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    out = row_local_permute_int8(xj, jnp.asarray(p), interpret=True)
    want = np.take_along_axis(np.asarray(xj),
                              np.broadcast_to(p[:, None].swapaxes(0, 1),
                                              (d, r, c)), axis=2)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint16 if dtype == jnp.bfloat16
                             else np.uint32),
        want.view(np.uint16 if dtype == jnp.bfloat16 else np.uint32))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_row_local_permute_hier_int8_exact(dtype):
    """int8 byte-plane HIER kernel: exact bit transport (incl. NaN/inf/-0)
    through both one-hot levels and the int8 cross-block exchange."""
    from ihgnn_tpu.ops.pallas.permute import (hier_int8_ok,
                                              row_local_permute_hier_int8)
    rng = np.random.default_rng(13)
    d, r, c = 8, 16, 512
    assert hier_int8_ok(d, r, c, dtype)
    perms = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    packed = jnp.asarray(route_rows_hier(perms))
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    x.reshape(-1)[::97] = np.nan
    x.reshape(-1)[5::191] = np.inf
    x.reshape(-1)[11::191] = -0.0
    xj = jnp.asarray(x).astype(dtype)
    out = row_local_permute_hier_int8(xj, packed, interpret=True)
    want = np.take_along_axis(np.asarray(xj),
                              np.broadcast_to(perms[None], (d, r, c)), axis=2)
    view = np.uint16 if dtype == jnp.bfloat16 else np.uint32
    np.testing.assert_array_equal(np.asarray(out).view(view),
                                  want.view(view))


@pytest.mark.parametrize("w", [256, 512])
def test_row_local_permute_hier_wide_blocks(w):
    """W-parametric hier kernel (round 3): wider second-level blocks give
    fewer matmul issues + shorter exchanges; parity vs the direct gather
    must hold for every supported W (both routing impls)."""
    from ihgnn_tpu.ops import native
    rng = np.random.default_rng(w)
    d, r, c = 8, 16, 1024
    assert hier_eligible(c, w)
    perms = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    for packed in filter(
            lambda p: p is not None,
            [route_rows_hier(perms, w),
             native.route_rows_hier(perms, w)]):
        assert (unpack_hier_rows(packed, w) == perms).all()
        x = rng.standard_normal((d, r, c)).astype(np.float32)
        xj = jnp.asarray(x, jnp.bfloat16)
        ref = np.take_along_axis(np.asarray(xj, np.float32), perms[None],
                                 axis=2)
        out = row_local_permute_hier(xj, jnp.asarray(packed),
                                     interpret=True, w=w)
        np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


def test_dg_kernels_interpret():
    """Dynamic-gather permute kernels (round 4): row_local_permute_dg and
    the fused transposed_local_permute_dg match take_along_axis for f32
    and bf16 (bf16 rides the in-VMEM f32 upcast — exact data movement)."""
    from ihgnn_tpu.ops.benes import route_rows_hier
    from ihgnn_tpu.ops.pallas.permute import (dg_ok, row_local_permute_dg,
                                              tlp_dg_ok,
                                              transposed_local_permute_dg)
    rng = np.random.default_rng(3)
    d, r, c = 8, 128, 512
    perm = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    packed = jnp.asarray(route_rows_hier(perm, 128))
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((d, r, c)).astype(np.float32)
                        ).astype(dt)
        ref = np.take_along_axis(np.asarray(x.astype(jnp.float32)),
                                 np.broadcast_to(perm[None], (d, r, c)),
                                 axis=2)
        assert dg_ok(d, r, c, dt)
        out = row_local_permute_dg(x, packed, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), ref)
        assert tlp_dg_ok(d, r, c, dt)
        out_t = transposed_local_permute_dg(x, packed, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(jnp.swapaxes(out_t, 1, 2).astype(jnp.float32)), ref)


def test_dg_kernel_nan_inf_transport():
    """dg permutes transport NaN/inf/-0 bit patterns unchanged (pure data
    movement — no arithmetic touches the values)."""
    from ihgnn_tpu.ops.benes import route_rows_hier
    from ihgnn_tpu.ops.pallas.permute import row_local_permute_dg
    rng = np.random.default_rng(4)
    d, r, c = 8, 128, 256
    perm = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    packed = jnp.asarray(route_rows_hier(perm, 128))
    x = rng.standard_normal((d, r, c)).astype(np.float32)
    x[0, 0, 5] = np.nan
    x[1, 3, 7] = np.inf
    x[2, 5, 9] = -0.0
    out = np.asarray(row_local_permute_dg(jnp.asarray(x), packed,
                                          interpret=True))
    ref = np.take_along_axis(x, np.broadcast_to(perm[None], x.shape), axis=2)
    np.testing.assert_array_equal(out.view(np.uint32), ref.view(np.uint32))
