"""Clos/Beneš routing of a static permutation through row-local stages.

Groundwork for the round-2 Pallas permutation kernel (docs/KERNELS.md):
any permutation of E = S·S elements, viewed as an [S, S] row-major grid,
factors as

    out = P2_rows ∘ T ∘ P1_rows ∘ T ∘ P0_rows

where each ``Pk_rows`` permutes elements *within* rows (VMEM-local, cheap
on TPU) and ``T`` is the full [S, S] block transpose (a tiled
near-bandwidth kernel). Existence follows from König's theorem: the demand
multigraph between input rows and output rows is S-regular bipartite,
hence S-edge-colorable; color classes give the middle-stage assignment.

The coloring is computed by recursive Euler splits (S must be a power of
two): orienting an Eulerian circuit of a 2k-regular bipartite multigraph
splits it into two k-regular halves; recursing down to 1-regular yields
perfect matchings = colors. Host-side, one-time per graph; O(E log S).

All functions are pure NumPy (no accelerator).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def euler_split(u: np.ndarray, v: np.ndarray, n_left: int, n_right: int
                ) -> np.ndarray:
    """Split a bipartite multigraph with all-even degrees into two halves of
    equal degree per vertex.

    Args:
      u, v: [E] endpoint indices (left, right) of each edge.
      n_left, n_right: vertex counts.
    Returns a boolean mask [E]: True = edge in half A. Every vertex has
    exactly half its edges in A (degrees must all be even).
    """
    e_count = len(u)
    # incidence lists: for each vertex, the edges touching it
    left_edges = [[] for _ in range(n_left)]
    right_edges = [[] for _ in range(n_right)]
    for e in range(e_count):
        left_edges[u[e]].append(e)
        right_edges[v[e]].append(e)
    left_ptr = [0] * n_left
    right_ptr = [0] * n_right

    used = np.zeros(e_count, bool)
    mask = np.zeros(e_count, bool)

    def next_unused(vertex, on_left):
        lst = left_edges[vertex] if on_left else right_edges[vertex]
        ptr = left_ptr if on_left else right_ptr
        while ptr[vertex] < len(lst):
            e = lst[ptr[vertex]]
            ptr[vertex] += 1
            if not used[e]:
                return e
        return -1

    # walk Eulerian circuits; edges traversed left→right go to half A.
    # In a bipartite graph every circuit alternates sides, so each vertex
    # gets equal A/B incidences.
    for start in range(e_count):
        if used[start]:
            continue
        e = start
        at_left = True    # we "arrive" at u[e] and leave via e (left→right)
        while e != -1 and not used[e]:
            used[e] = True
            mask[e] = at_left
            vertex = v[e] if at_left else u[e]
            at_left = not at_left
            e = next_unused(vertex, at_left)

    return mask


def edge_color_regular_bipartite(u: np.ndarray, v: np.ndarray, s: int,
                                 n_vertices: int) -> np.ndarray:
    """S-edge-color an S-regular bipartite multigraph (S a power of two).

    Args:
      u, v: [E] endpoints; every left and right vertex has degree exactly s.
    Returns colors [E] in [0, s): per vertex, each color appears once.
    """
    assert s & (s - 1) == 0, "degree must be a power of two"
    e_count = len(u)
    colors = np.zeros(e_count, np.int32)

    def recurse(edge_ids: np.ndarray, degree: int, base: int):
        if degree == 1:
            colors[edge_ids] = base
            return
        mask = euler_split(u[edge_ids], v[edge_ids], n_vertices, n_vertices)
        recurse(edge_ids[mask], degree // 2, base)
        recurse(edge_ids[~mask], degree // 2, base + degree // 2)

    recurse(np.arange(e_count), s, 0)
    return colors


def benes_route(perm: np.ndarray, s: int
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Factor ``out[j] = in[perm[j]]`` (E = s*s elements) into three
    row-local permutations around two [s, s] transposes.

    Returns (p0, p1, p2), each [s, s] with rows permuting columns:
      stage0: a0[r, c] = in[r, p0[r, c]]
      T:      t0[r, c] = a0[c, r]
      stage1: a1[r, c] = t0[r, p1[r, c]]
      T:      t1[r, c] = a1[c, r]
      stage2: out[r, c] = t1[r, p2[r, c]]
    """
    e_count = s * s
    perm = np.asarray(perm, np.int64)
    assert perm.shape == (e_count,)

    j = np.arange(e_count)
    out_row, out_col = j // s, j % s
    in_pos = perm
    in_row, in_col = in_pos // s, in_pos % s

    # demand multigraph: one edge per element, (input row) -> (output row)
    color = edge_color_regular_bipartite(in_row, out_row, s, s)

    # stage 0: within input row r, place the element colored k at column k
    p0 = np.empty((s, s), np.int64)
    p0[in_row, color] = in_col

    # after T, row k holds (at column r) the color-k element of input row r.
    # stage 1: within color-row k, place the element destined for output
    # row r_out at column r_out
    p1 = np.empty((s, s), np.int64)
    p1[color, out_row] = in_row

    # after T, row r_out holds (at column k) its color-k element.
    # stage 2: move it to its final column
    p2 = np.empty((s, s), np.int64)
    p2[out_row, out_col] = color

    return p0, p1, p2


def benes_route_rect(perm: np.ndarray, rows: int, cols: int
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rectangular generalization: factor ``out[j] = in[perm[j]]`` over
    E = rows*cols elements (viewed as an [rows, cols] row-major grid) into

      stage0: a0[r, c]  = in[r, p0[r, c]]      (p0: [rows, cols])
      T:      t0[k, r]  = a0[r, k]
      stage1: a1[k, r]  = t0[k, p1[k, r]]      (p1: [cols, rows])
      T:      t1[r, k]  = a1[k, r]
      stage2: out[r, c] = t1[r, p2[r, c]]      (p2: [rows, cols])

    cols must be a power of two (Euler-split coloring); rows is arbitrary.
    Pure-NumPy oracle for the native csrc/routing.cc implementation.
    """
    e_count = rows * cols
    perm = np.asarray(perm, np.int64)
    assert perm.shape == (e_count,)

    j = np.arange(e_count)
    out_row, out_col = j // cols, j % cols
    in_row, in_col = perm // cols, perm % cols

    # demand multigraph (input row -> output row) is cols-regular bipartite
    color = edge_color_regular_bipartite(in_row, out_row, cols, rows)

    p0 = np.empty((rows, cols), np.int64)
    p0[in_row, color] = in_col
    p1 = np.empty((cols, rows), np.int64)
    p1[color, out_row] = in_row
    p2 = np.empty((rows, cols), np.int64)
    p2[out_row, out_col] = color
    return p0, p1, p2


def apply_benes_rect(x: np.ndarray, p0: np.ndarray, p1: np.ndarray,
                     p2: np.ndarray) -> np.ndarray:
    """Reference execution of the rectangular factored permutation.
    x: [E, ...] rows; returns x[perm]."""
    rows, cols = p0.shape
    extra = ([1] * (x.ndim - 1))
    grid = x.reshape(rows, cols, *x.shape[1:])
    a0 = np.take_along_axis(grid, p0.reshape(rows, cols, *extra), axis=1)
    t0 = np.swapaxes(a0, 0, 1)
    a1 = np.take_along_axis(t0, p1.reshape(cols, rows, *extra), axis=1)
    t1 = np.swapaxes(a1, 0, 1)
    out = np.take_along_axis(t1, p2.reshape(rows, cols, *extra), axis=1)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Hierarchical in-row decomposition (round 2, second level of the Clos)
# ---------------------------------------------------------------------------
#
# A row-local stage table of length L asks the Pallas kernel for a one-hot
# matmul of depth L per output element (MXU cost ∝ L). Viewing each row as
# its own [B, W] grid (W = 128 = one MXU lane tile, B = L/W) and routing it
# through a second-level Clos factors the row permutation into
#
#     out[b, w] = t1[b, p2[b, w]]          in-block one-hot, depth W
#     t1[b, k]  = a0[s[b, k], k]           cross-block per-lane exchange
#     a0[j, w]  = in[j, p0[j, w]]          in-block one-hot, depth W
#
# cutting MXU depth from L to 2W; the exchange is B(B-1) vector selects in
# VMEM (no HBM traffic, no matmul). The three [B, W] tables pack into ONE
# int32 per element so stage-table bandwidth is unchanged:
#
#     word = p0 | (s << 10) | (p2 << 20)        (each field < 1024)

HIER_W = 128
# largest B the hier kernel's unrolled exchange pays off for. The
# fori-structured big-B variant (_hier_big_kernel, correct and tested)
# measured WORSE than the flat one-hot kernel at stress depth (83 vs
# 47 ms/pass, B=77 bf16): the select-chain exchange moves O(B^2) VMEM
# bytes per row (every select reads a full [d, W] operand). Long rows
# stay on the flat kernel; the real fix is a third routing level with an
# in-row transpose (square row lengths) — see docs/KERNELS.md.
HIER_B_CAP = 16


def hier_eligible(length: int, w: int = HIER_W) -> bool:
    b = length // w
    return length % w == 0 and 2 <= b <= HIER_B_CAP and w <= 1024


def route_rows_hier(p: np.ndarray, w: int = HIER_W) -> np.ndarray:
    """Route each row of ``p`` ([NR, L], each row a permutation of
    range(L)) through a [B, W] Clos; returns packed int32 [NR, L].
    Pure-NumPy oracle for the native csrc/routing.cc implementation."""
    p = np.asarray(p, np.int64)
    nr, length = p.shape
    b = length // w
    assert hier_eligible(length, w), (length, w)
    packed = np.empty((nr, length), np.int32)
    for r in range(nr):
        p0, p1, p2 = benes_route_rect(p[r], b, w)
        s = p1.T                                    # [B, W]
        packed[r] = (p0.reshape(-1) | (s.reshape(-1) << 10)
                     | (p2.reshape(-1) << 20)).astype(np.int32)
    return packed


def unpack_hier_rows(packed: np.ndarray, w: int = HIER_W) -> np.ndarray:
    """Recover the full per-row permutation from packed hier tables
    (NumPy). full[r, c] = source in-row position of output position c."""
    packed = np.asarray(packed)
    nr, length = packed.shape
    p0 = packed & 1023
    s = (packed >> 10) & 1023
    p2 = packed >> 20
    # out position c = b*W + w': k = p2[c]; j = s[b*W + k]; src = j*W + p0[j*W + k]
    base = (np.arange(length) // w) * w             # b*W per position
    k = p2
    j = np.take_along_axis(s, base[None, :] + k, axis=1)
    src = j * w + np.take_along_axis(p0, j * w + k, axis=1)
    return src.astype(np.int64)


def apply_hier_rows(x: np.ndarray, packed: np.ndarray,
                    w: int = HIER_W) -> np.ndarray:
    """Stage-by-stage reference execution of the hierarchical in-row
    permutation. x: [NR, L, ...]; returns out[r, c] = x[r, full[r, c]]."""
    nr, length = packed.shape
    b = length // w
    p0 = (packed & 1023).reshape(nr, b, w)
    s = ((packed >> 10) & 1023).reshape(nr, b, w)
    p2 = (packed >> 20).reshape(nr, b, w)
    extra = [1] * (x.ndim - 2)
    grid = x.reshape(nr, b, w, *x.shape[2:])
    a0 = np.take_along_axis(grid, p0.reshape(nr, b, w, *extra), axis=2)
    t1 = np.take_along_axis(a0, s.reshape(nr, b, w, *extra), axis=1)
    out = np.take_along_axis(t1, p2.reshape(nr, b, w, *extra), axis=2)
    return out.reshape(x.shape)


def apply_benes(x: np.ndarray, p0: np.ndarray, p1: np.ndarray,
                p2: np.ndarray) -> np.ndarray:
    """Reference execution of the factored permutation (for tests / the
    XLA fallback). x: [E, ...] rows; returns x[perm]."""
    s = p0.shape[0]
    grid = x.reshape(s, s, *x.shape[1:])
    a0 = np.take_along_axis(
        grid, p0.reshape(s, s, *([1] * (x.ndim - 1))), axis=1)
    t0 = np.swapaxes(a0, 0, 1)
    a1 = np.take_along_axis(
        t0, p1.reshape(s, s, *([1] * (x.ndim - 1))), axis=1)
    t1 = np.swapaxes(a1, 0, 1)
    out = np.take_along_axis(
        t1, p2.reshape(s, s, *([1] * (x.ndim - 1))), axis=1)
    return out.reshape(x.shape)
