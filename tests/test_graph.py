"""Graph packing golden tests against tiny hand-built graphs, mirroring
Helpers/Graph.py semantics (node index offsets, degree accounting, COO
coalescing with duplicate summation, 1e-8 zero-degree floor)."""

import numpy as np
import pytest

from ihgnn_tpu.config import V
from ihgnn_tpu.graph import (DEGREE_FLOOR, build_graph2d, build_hypergraph,
                             build_log_hypergraph)

# 2 users, 2 queries, 3 items → node ids: u0=0 u1=1 q0=2 q1=3 i0=4 i1=5 i2=6
U, Q, I = 2, 2, 3
N = U + Q + I
# (u, q, i, flag)
INTERACTIONS = np.array([
    [0, 0, 0, 1],
    [0, 0, 1, 1],   # same (u,q) pair twice
    [1, 1, 0, 1],
], np.int32)


def test_hypergraph_packing():
    g = build_hypergraph(INTERACTIONS, N, U, Q)
    assert g.edge_count == 3 and g.node_count == N
    np.testing.assert_array_equal(g.i3, [[0, 2, 4], [0, 2, 5], [1, 3, 4]])
    # degrees: u0=2, u1=1, q0=2, q1=1, i0=2, i1=1, i2=0(floor)
    expect_dv = np.array([2, 1, 2, 1, 2, 1, DEGREE_FLOOR], np.float32)
    np.testing.assert_allclose(g.dv[:, 0], expect_dv)
    # incidence sorted by node; edge ids match
    assert np.all(np.diff(g.inc_node) >= 0)
    assert len(g.inc_node) == 9
    # reconstruct: node 0 belongs to edges {0,1}
    edges_of_node0 = sorted(g.inc_edge[g.inc_node == 0])
    assert edges_of_node0 == [0, 1]


def test_graph2d_uqi_coalesce_and_degrees():
    g = build_graph2d(INTERACTIONS, N, U, Q, completeness=V.GRAPH_UQI)
    # degree += 2 per interaction for each of u, q, i
    expect_dv = np.array([4, 2, 4, 2, 4, 2, DEGREE_FLOOR], np.float32)
    np.testing.assert_allclose(g.dv[:, 0], expect_dv)
    # duplicate (u0,q0) pairs sum: A[0,2] == 2
    a = np.zeros((N, N), np.float32)
    a[g.row, g.col] = g.val
    assert a[0, 2] == 2 and a[2, 0] == 2
    assert a[0, 4] == 1 and a[4, 0] == 1  # u0-i0
    assert a[2, 4] == 1  # q0-i0
    np.testing.assert_allclose(a, a.T)  # symmetric
    # entries sorted by (row, col)
    keys = g.row.astype(np.int64) * N + g.col
    assert np.all(np.diff(keys) > 0)
    # dst_order sorts by col
    assert np.all(np.diff(g.col[g.dst_order]) >= 0)


@pytest.mark.parametrize("mode,pairs", [
    (V.GRAPH_ONLY_UQ, [(0, 2), (1, 3)]),
    (V.GRAPH_ONLY_UI, [(0, 4), (0, 5), (1, 4)]),
    (V.GRAPH_ONLY_QI, [(2, 4), (2, 5), (3, 4)]),
])
def test_graph2d_partial_completeness(mode, pairs):
    g = build_graph2d(INTERACTIONS, N, U, Q, completeness=mode)
    a = np.zeros((N, N), np.float32)
    a[g.row, g.col] = g.val
    for r, c in pairs:
        assert a[r, c] >= 1 and a[c, r] >= 1
    np.testing.assert_allclose(a, a.T)


def test_graph2d_self_connection():
    g = build_graph2d(INTERACTIONS, N, U, Q, use_self_connection=True)
    a = np.zeros((N, N), np.float32)
    a[g.row, g.col] = g.val
    assert np.all(np.diag(a) == 1)
    assert g.dv[6, 0] == 1  # isolated node has only the self loop


def test_log_hypergraph_ragged():
    # edge 0 = {u0, q0, i0, i1}; edge 1 = {u1, q1, i0}
    log_nodes = [[0, 2, 4, 5], [1, 3, 4]]
    g = build_log_hypergraph(log_nodes, N)
    assert g.edge_count == 2
    np.testing.assert_allclose(g.de[:, 0], [4, 3])
    expect_dv = np.array([1, 1, 1, 1, 2, 1, DEGREE_FLOOR], np.float32)
    np.testing.assert_allclose(g.dv[:, 0], expect_dv)
    assert np.all(np.diff(g.inc_node) >= 0)
    assert np.all(np.diff(g.edge_ids) >= 0)
