"""Beneš/Clos routing of static permutations (round-2 kernel groundwork)."""

import numpy as np
import pytest

from ihgnn_tpu.ops.benes import (apply_benes, benes_route,
                                 edge_color_regular_bipartite, euler_split)


def test_euler_split_halves_degrees():
    rng = np.random.default_rng(0)
    s, n = 8, 16
    # s-regular bipartite multigraph from s random matchings
    u = np.tile(np.arange(n), s)
    v = np.concatenate([rng.permutation(n) for _ in range(s)])
    mask = euler_split(u, v, n, n)
    for vertex in range(n):
        assert mask[u == vertex].sum() == s // 2
        assert mask[v == vertex].sum() == s // 2


@pytest.mark.parametrize("s", [2, 4, 16])
def test_edge_coloring_is_proper(s):
    rng = np.random.default_rng(s)
    u = np.tile(np.arange(s), s)
    v = np.concatenate([rng.permutation(s) for _ in range(s)])
    colors = edge_color_regular_bipartite(u, v, s, s)
    for vertex in range(s):
        assert sorted(colors[u == vertex]) == list(range(s))
        assert sorted(colors[v == vertex]) == list(range(s))


@pytest.mark.parametrize("s", [2, 4, 8, 64])
def test_benes_route_reproduces_permutation(s):
    rng = np.random.default_rng(s)
    e = s * s
    perm = rng.permutation(e)
    p0, p1, p2 = benes_route(perm, s)
    # all stages are row-local permutations
    for p in (p0, p1, p2):
        assert np.all(np.sort(p, axis=1) == np.arange(s))
    x = rng.standard_normal((e, 3)).astype(np.float32)
    np.testing.assert_array_equal(apply_benes(x, p0, p1, p2), x[perm])


@pytest.mark.parametrize("rows,cols", [(8, 4), (24, 32), (128, 16)])
def test_benes_route_rect(rows, cols):
    from ihgnn_tpu.ops.benes import apply_benes_rect, benes_route_rect

    rng = np.random.default_rng(rows * cols)
    perm = rng.permutation(rows * cols)
    p0, p1, p2 = benes_route_rect(perm, rows, cols)
    x = rng.standard_normal((rows * cols, 2)).astype(np.float32)
    np.testing.assert_array_equal(apply_benes_rect(x, p0, p1, p2), x[perm])


def test_native_routing_matches_numpy_oracle():
    """csrc/routing.cc against the NumPy implementation (both must invert
    the permutation; stage tables may legitimately differ)."""
    from ihgnn_tpu.ops import native
    from ihgnn_tpu.ops.benes import apply_benes_rect

    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    rows, cols = 48, 64
    perm = rng.permutation(rows * cols)
    p0, p1, p2 = native.benes_route(perm, rows, cols)
    for p, row_len in ((p0, cols), (p1, rows), (p2, cols)):
        assert np.all(np.sort(p, axis=1) == np.arange(row_len))
    x = rng.standard_normal((rows * cols, 3)).astype(np.float32)
    np.testing.assert_array_equal(apply_benes_rect(x, p0, p1, p2), x[perm])


def test_benes_route_identity_and_reverse():
    s = 16
    e = s * s
    for perm in (np.arange(e), np.arange(e)[::-1].copy()):
        p0, p1, p2 = benes_route(perm, s)
        x = np.arange(e, dtype=np.float32)[:, None]
        np.testing.assert_array_equal(apply_benes(x, p0, p1, p2), x[perm])
