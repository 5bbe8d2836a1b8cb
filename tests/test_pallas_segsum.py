"""Pallas CSR segment-sum kernel: correctness in interpreter mode (CPU),
plus the custom-vjp hyperedge ops against the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihgnn_tpu.data.synthetic import make_synthetic_data
from ihgnn_tpu.ops.hyperagg import make_hyper_ops
from ihgnn_tpu.ops.pallas.segsum import (BLOCK, csr_segment_sum,
                                         pack_csr_tiles,
                                         prepare_segment_inputs)

D = 32


@pytest.mark.parametrize("n,k", [(700, 5000), (100, 50), (1, 1), (300, 2048)])
def test_kernel_matches_xla(n, k):
    rng = np.random.default_rng(n + k)
    ids = np.sort(rng.integers(0, n, k)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((k, D)).astype(np.float32))
    v, ids2d, ptr = prepare_segment_inputs(vals, ids, n)
    out = csr_segment_sum(v, ids2d, ptr, n, interpret=True)
    ref = jax.ops.segment_sum(vals, jnp.asarray(ids), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_kernel_skewed_degrees():
    rng = np.random.default_rng(0)
    n, k = 500, 8000
    # one hub segment holding half the entries + many empty segments
    ids = np.sort(np.concatenate([
        np.zeros(4000, np.int64),
        rng.integers(400, 500, 4000)])).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((k, D)).astype(np.float32))
    v, ids2d, ptr = prepare_segment_inputs(vals, ids, n)
    out = csr_segment_sum(v, ids2d, ptr, n, interpret=True)
    ref = jax.ops.segment_sum(vals, jnp.asarray(ids), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)


def test_pack_csr_tiles():
    ids = np.array([0, 0, 3, 129, 129, 129, 400], np.int32)
    ptr, n_pad = pack_csr_tiles(ids, 401)
    # tiles of 128: tile 0 covers nodes [0,128) -> entries [0,3)
    assert ptr[0] == 0 and ptr[1] == 3
    assert ptr[2] == 6   # nodes [128,256) -> 3 entries
    assert ptr[-1] == 7


def test_hypergraph_carries_kernel_pack():
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)
    g = data.hypergraph
    kp = g.kp
    assert kp is not None
    assert kp.e == g.edge_count and kp.n == g.node_count
    assert kp.e_pad == kp.rows * kp.cols >= g.edge_count
    assert kp.k_pad == 3 * kp.e_pad and kp.k_pad % BLOCK == 0
    # segsum ids: three e_pad-wide regions; within each, the multiset of
    # real ids equals the role's sorted incidence ids and tails are
    # sentinels (q/i regions are stored block-shuffled — t1 order)
    ids_flat = np.asarray(kp.ids2d).reshape(-1)
    e, e_pad = kp.e, kp.e_pad
    for r in range(3):
        region = ids_flat[r * e_pad:(r + 1) * e_pad]
        real = np.sort(region[region != 2**31 - 1])
        np.testing.assert_array_equal(real, np.sort(g.i3[:, r]))
        assert (region == 2**31 - 1).sum() == e_pad - e
    # u region: σ packs store u ids at the σ-scrambled edge positions
    # (row-local; real ids where the σ position holds a real edge); the
    # non-σ layout is the identity edge order
    if kp.sigma:
        from ihgnn_tpu.ops.pallas.permute import unpack_stage_perm
        p2q = np.asarray(unpack_stage_perm(kp.sig_stage))
        base = np.arange(kp.rows)[:, None] * kp.cols
        pos_of_edge = (base + p2q).reshape(-1)[:e]
        np.testing.assert_array_equal(ids_flat[pos_of_edge], g.i3[:, 0])
    else:
        np.testing.assert_array_equal(ids_flat[:e], g.i3[:, 0])
    # the node-major entry order is [u | q-rank | i-rank] (graph.py)
    e = g.edge_count
    np.testing.assert_array_equal(g.inc_edge[:e], np.arange(e))
    np.testing.assert_array_equal(
        g.inc_edge[e:2 * e], np.argsort(g.i3[:, 1], kind="stable"))
    np.testing.assert_array_equal(
        g.inc_edge[2 * e:], np.argsort(g.i3[:, 2], kind="stable"))


def test_hyper_ops_xla_path_grads():
    """On CPU the dispatch takes the XLA path; check op gradients equal
    direct autodiff through plain indexing."""
    data = make_synthetic_data(user_count=6, query_count=5, item_count=9,
                               vocab_size=12, log_count=40, seed=3)
    g = data.hypergraph
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.node_count, D)).astype(np.float32))
    ef = jnp.asarray(rng.standard_normal((g.edge_count, D)).astype(np.float32))
    gather, scatter = make_hyper_ops(g)

    def f_op(x):
        u, q, i = gather(x.T)
        return (u ** 2).sum() + (q ** 2).sum() + (i ** 2).sum()

    def f_ref(x):
        return ((x[g.i3]) ** 2).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(f_op)(x)),
                               np.asarray(jax.grad(f_ref)(x)), rtol=1e-5)

    def s_op(ef):
        return (scatter(ef.T) ** 3).sum()

    def s_ref(ef):
        h = jax.ops.segment_sum(ef[g.inc_edge], jnp.asarray(g.inc_node),
                                g.node_count)
        return (h ** 3).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(s_op)(ef)),
                               np.asarray(jax.grad(s_ref)(ef)),
                               rtol=1e-4, atol=1e-4)


def test_segsum_block_2048_interpret():
    """block=2048 segsum (stress cols=2048 grids) matches segment_sum."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from ihgnn_tpu.ops.pallas.segsum import csr_segment_sum_t, pack_csr_tiles
    rng = np.random.default_rng(9)
    k, n, d = 3800, 300, 4
    ids = np.sort(rng.integers(0, n, k)).astype(np.int32)
    k_pad = 4096
    ids_pad = np.concatenate([ids, np.full(k_pad - k, 2**31 - 1, np.int32)])
    vals = rng.standard_normal((d, k_pad)).astype(np.float32)
    tile_ptr, _ = pack_csr_tiles(ids, n)
    with pltpu.force_tpu_interpret_mode():
        out = csr_segment_sum_t(jnp.asarray(vals),
                                jnp.asarray(ids_pad.reshape(-1, 128)),
                                jnp.asarray(tile_ptr), n,
                                out_transposed=True, block=2048)
    ref = jax.ops.segment_sum(vals[:, :k].T, ids, num_segments=n).T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sigma_pack_mid_scale_twins():
    """σ pack index math at a mid-scale grid where the expand rows are
    WIDER than the Clos rows (exp_cols=1024 > cols=512 — the σ relabel
    and stage-0 compositions must stay within cols-sub-rows): jnp-twin
    gather/scatter over a synthetic 300k-edge graph match direct
    formulations. (cols=2048 stress grids use the same code path with
    seg_block=2048; the block=2048 kernel is covered above and the full
    grid on the TPU stress run.)"""
    from ihgnn_tpu.ops.hyperagg import make_hyper_ops
    from ihgnn_tpu.ops.packing import build_hyper_kernel_pack
    from ihgnn_tpu.graph import HyperGraph

    rng = np.random.default_rng(5)
    U, Q, I = 3000, 2000, 5000
    e = 300_000
    n = U + Q + I
    u = np.sort(rng.integers(0, U, e))
    i3 = np.stack([u, U + rng.integers(0, Q, e),
                   U + Q + rng.integers(0, I, e)], axis=1).astype(np.int32)
    kp = build_hyper_kernel_pack(i3, n)
    assert kp is not None and kp.sigma
    assert kp.cols == 512 and kp.seg_block == 1024

    dv = np.zeros(n, np.float32)
    np.add.at(dv, i3.reshape(-1), 1.0)
    dv[dv == 0] = 1e-8
    inc_edge = np.concatenate([np.arange(e), np.argsort(i3[:, 1], kind="stable"),
                               np.argsort(i3[:, 2], kind="stable")]).astype(np.int32)
    inc_node = np.concatenate([i3[:, 0], np.sort(i3[:, 1]),
                               np.sort(i3[:, 2])]).astype(np.int32)
    g = HyperGraph(i3=i3, dv=dv, inc_node=inc_node, inc_edge=inc_edge,
                   edge_mask=None, node_count=n, edge_count=e, kp=kp)

    d = 4
    x = rng.standard_normal((d, n)).astype(np.float32)
    # call the pack pipeline directly (make_hyper_ops dispatches to the
    # XLA fallback on CPU); its impls run the jnp twins here
    from ihgnn_tpu.ops.hyperagg import _gather_roles_pallas, _scatter_pallas
    x_pad = jnp.pad(jnp.asarray(x), ((0, 0), (0, kp.src_pad - n)))
    uq, qq, iq = _gather_roles_pallas(x_pad, kp)
    # recover σ positions and check against direct gathers
    from ihgnn_tpu.ops.pallas.permute import unpack_stage_perm
    p2q = np.asarray(unpack_stage_perm(kp.sig_stage))
    pos = (np.arange(kp.rows)[:, None] * kp.cols + p2q).reshape(-1)[:e]
    for out, r in ((uq, 0), (qq, 1), (iq, 2)):
        np.testing.assert_allclose(np.asarray(out)[:, pos],
                                   x[:, i3[:, r]], rtol=1e-5, atol=1e-5)
    # scatter: σ-ordered input vs direct index_add
    ef = rng.standard_normal((d, kp.e_pad)).astype(np.float32)
    out = np.asarray(_scatter_pallas(jnp.asarray(ef), kp))
    ef_edge = ef[:, pos]
    ref = np.zeros((d, n), np.float32)
    np.add.at(ref.T, inc_node, ef_edge[:, inc_edge].T)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_segsum3_regions_interpret():
    """csr_segment_sum3_t over three region refs == csr_segment_sum_t over
    their concat (the hypergraph scatter's concat-free path, round 4)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from ihgnn_tpu.ops.pallas.segsum import (csr_segment_sum3_t,
                                             csr_segment_sum_t,
                                             pack_csr_tiles)
    rng = np.random.default_rng(11)
    e_pad, n, d = 2048, 300, 8
    # region layout [u | q | i]: per-region sorted ids with sentinel tails
    regions, ids_all = [], []
    for r in range(3):
        k = int(rng.integers(e_pad // 2, e_pad - 7))
        ids = np.sort(rng.integers(0, n, k)).astype(np.int32)
        ids_all.append(np.concatenate(
            [ids, np.full(e_pad - k, 2**31 - 1, np.int32)]))
        regions.append(rng.standard_normal((d, e_pad)).astype(np.float32))
    ids_cat = np.concatenate(ids_all)
    # tile_ptr over the concat layout (piecewise like ops/packing.py)
    bounds = np.arange(0, ((n + 127) // 128 + 1) * 128, 128)
    p0 = np.searchsorted(ids_all[0], bounds)
    p1 = np.searchsorted(ids_all[1], bounds)
    p2 = np.searchsorted(ids_all[2], bounds)
    k0 = (ids_all[0] < 2**31 - 1).sum()
    k1 = (ids_all[1] < 2**31 - 1).sum()
    tile_ptr = np.where(p0 < k0, p0,
                        np.where(p1 < k1, e_pad + p1,
                                 2 * e_pad + p2)).astype(np.int32)
    ids2d = jnp.asarray(ids_cat.reshape(-1, 128))
    ptr = jnp.asarray(tile_ptr)
    with pltpu.force_tpu_interpret_mode():
        out3 = csr_segment_sum3_t(*(jnp.asarray(r) for r in regions),
                                  ids2d, ptr, n, out_transposed=True)
        out1 = csr_segment_sum_t(jnp.asarray(np.concatenate(regions, 1)),
                                 ids2d, ptr, n, out_transposed=True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
