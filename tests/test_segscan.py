"""Scan+place segment-sum kernel — interpreter-mode correctness."""

import jax.numpy as jnp
import numpy as np

from ihgnn_tpu.ops.pallas.segscan import csr_segment_scan_t, pack_scan_inputs
from ihgnn_tpu.ops.pallas.segsum import BLOCK


def _run_case(seed, k, n, d=8, shuffle_within_block=True):
    rng = np.random.default_rng(seed)
    k_pad = -(-max(k, 1) // BLOCK) * BLOCK
    ids = np.sort(rng.integers(0, n, size=k))
    if shuffle_within_block:
        # the Clos stage-2 fusion leaves entries shuffled within blocks
        shuf = ids.copy()
        for b in range(0, k - BLOCK + 1, BLOCK):
            rng.shuffle(shuf[b:b + BLOCK])
        ids_stream = shuf
    else:
        ids_stream = ids
    ids_pad = np.concatenate(
        [ids_stream, np.full(k_pad - k, 2**31 - 1, np.int64)])
    vals = rng.standard_normal((d, k_pad)).astype(np.float32)

    pack = pack_scan_inputs(ids_pad, n)
    out = np.asarray(csr_segment_scan_t(jnp.asarray(vals), pack, n,
                                        interpret=True))
    ref = np.zeros((d, n), np.float64)
    np.add.at(ref.T, ids_pad[:k].astype(np.int64), vals[:, :k].T)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_segscan_sorted_ids():
    _run_case(0, 5000, 700, shuffle_within_block=False)


def test_segscan_block_shuffled_ids():
    _run_case(1, 5000, 700)


def test_segscan_dense_few_segments():
    # long runs spanning many blocks exercise cross-block accumulation
    _run_case(2, 4096, 10)


def test_segscan_many_segments_sparse():
    # more segments than entries: most tiles see < 1 entry
    _run_case(3, 2000, 3000)
