"""Windowed gather kernels — interpreter-mode correctness."""

import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.ops.pallas.gather import (pack_windows, windowed_gather,
                                         windowed_gather_t)


def _banded_idx(rng, r, c, n):
    """Index table whose rows are sorted-ish (banded) into [0, n)."""
    base = np.sort(rng.integers(0, n, size=r * c)).reshape(r, c)
    return base


def test_windowed_gather_matches_take():
    rng = np.random.default_rng(0)
    d, r, c, n = 8, 128, 256, 4096
    idx = _banded_idx(rng, r, c, n)
    pk = pack_windows(idx)
    x = rng.standard_normal((d, pk.src_pad)).astype(np.float32)
    out = np.asarray(windowed_gather(jnp.asarray(x), pk.idx_rel, pk.win,
                                     pk.w, interpret=True))
    ref = x[:, idx.reshape(-1)]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_windowed_gather_t_is_transposed_gather():
    rng = np.random.default_rng(1)
    d, r, c, n = 8, 256, 256, 4096
    idx = _banded_idx(rng, r, c, n)
    pk = pack_windows(idx)
    x = rng.standard_normal((d, pk.src_pad)).astype(np.float32)
    out = np.asarray(windowed_gather_t(jnp.asarray(x), pk.idx_rel, pk.win,
                                       pk.w, interpret=True))
    ref = np.swapaxes(x[:, idx.reshape(-1)].reshape(d, r, c), 1, 2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_windowed_gather_t_bf16_exact():
    rng = np.random.default_rng(2)
    d, r, c, n = 4, 128, 128, 1024
    idx = _banded_idx(rng, r, c, n)
    pk = pack_windows(idx)
    x = jnp.asarray(rng.standard_normal((d, pk.src_pad))).astype(jnp.bfloat16)
    out = np.asarray(windowed_gather_t(x, pk.idx_rel, pk.win, pk.w,
                                       interpret=True)).astype(np.float32)
    xf = np.asarray(x, np.float32)
    ref = np.swapaxes(xf[:, idx.reshape(-1)].reshape(d, r, c), 1, 2)
    np.testing.assert_array_equal(out, ref)


def test_windowed_gather_int8_exact():
    """int8 byte-plane gather kernel: exact bit transport (incl. NaN/inf)
    for bf16 and f32 sources."""
    rng = np.random.default_rng(3)
    d, r, c, n = 8, 128, 256, 4096
    idx = _banded_idx(rng, r, c, n)
    pk = pack_windows(idx)
    x = rng.standard_normal((d, pk.src_pad)).astype(np.float32)
    x.reshape(-1)[::89] = np.nan
    x.reshape(-1)[7::157] = -np.inf
    for dtype, view in ((jnp.bfloat16, np.uint16), (jnp.float32, np.uint32)):
        xj = jnp.asarray(x).astype(dtype)
        out = np.asarray(windowed_gather(xj, pk.idx_rel, pk.win, pk.w,
                                         interpret=True, int8=True))
        ref = np.asarray(xj)[:, idx.reshape(-1)]
        np.testing.assert_array_equal(out.view(view), ref.view(view))


def test_windowed_gather_t_int8_exact():
    """int8 byte-plane fused transposed expand matches the plain kernel
    bit-for-bit."""
    rng = np.random.default_rng(4)
    d, r, c, n = 4, 128, 128, 1024
    idx = _banded_idx(rng, r, c, n)
    pk = pack_windows(idx)
    x = rng.standard_normal((d, pk.src_pad)).astype(np.float32)
    x.reshape(-1)[::71] = np.nan
    for dtype, view in ((jnp.bfloat16, np.uint16), (jnp.float32, np.uint32)):
        xj = jnp.asarray(x).astype(dtype)
        out = np.asarray(windowed_gather_t(xj, pk.idx_rel, pk.win, pk.w,
                                           interpret=True, int8=True))
        xf = np.asarray(xj)
        ref = np.swapaxes(xf[:, idx.reshape(-1)].reshape(d, r, c), 1, 2)
        np.testing.assert_array_equal(out.view(view), ref.view(view))
