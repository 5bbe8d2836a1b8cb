"""Beneš butterfly routing of in-block (128-lane) permutations.

The hier permute kernels realize in-block permutations with one-hot MXU
matmuls — ~160 weight-load cycles per 128 entries, the dominant cost of
every permutation pass at d=32 (the array is M-starved, so the weight
load never amortizes). A Beneš network replaces each one-hot with
2·log2(W)-1 = 13 VPU stages of roll+select (~0.5 cycles each on a
[32, 128] tile), cutting in-block permute compute ~5x and making the
passes DMA-bound.

Stage t applies an XOR-pairing exchange with shift m_t
(64,32,16,8,4,2,1,2,4,8,16,32,64): lanes k and k^m_t swap iff the
switch bit at lane k is set (bits are pair-symmetric). In-kernel:

  partner = select(k & m_t, roll(x, +m_t), roll(x, -m_t))
  x       = select(switch_bit, partner, x)

All routing is host-side, once per graph. ``route_block`` returns the
13 switch-bit vectors for one permutation; ``pack_bfly_words`` packs a
hierarchical stage table (stage-A switches | exchange selector |
stage-B switches) into one int32 word per element:

  bits [0, 13)  stage-A Beneš switches of the SOURCE block, this lane
  bits [13, 17) exchange: source-block selector of this OUTPUT position
  bits [17, 30) stage-B Beneš switches of the OUTPUT block, this lane

Pure NumPy oracle; csrc/routing.cc carries the fast native twin.
"""

from __future__ import annotations

import numpy as np

W = 128
N_STAGES = 13                      # 2*log2(W) - 1
STAGE_SHIFTS = tuple(64 >> r for r in range(7)) + tuple(
    2 << r for r in range(6))      # 64,32,16,8,4,2,1,2,4,8,16,32,64


def _route(perm: np.ndarray, out: np.ndarray, stage0: int, lane0: int,
           depth: int) -> None:
    """Route ``res[j] = src[perm[j]]`` (length L = 2^(depth+1), L >= 2)
    through a Beneš network; writes switch bits into ``out`` ([N_STAGES,
    W] uint8) at stage rows stage0 (entry), stage0+1.. (subnets),
    N_STAGES-1-stage0 (exit), lane offset lane0."""
    length = perm.shape[0]
    if length == 2:
        # middle stage: a single 2x2 switch
        bit = 1 if perm[0] == 1 else 0
        out[stage0, lane0] = bit
        out[stage0, lane0 + 1] = bit
        return
    m = length // 2
    inv = np.empty(length, np.int64)
    inv[perm] = np.arange(length)
    # color[j] = subnet (0 upper / 1 lower) carrying output j's element
    color = np.full(length, -1, np.int8)
    for start in range(length):
        if color[start] >= 0:
            continue
        j, c = start, 0
        while color[j] < 0:
            color[j] = c
            jp = j ^ m                       # output-pair partner
            color[jp] = 1 - c
            # input-pair constraint: perm[jp]'s partner input must ride
            # the opposite subnet of jp, i.e. subnet c
            j = inv[perm[jp] ^ m]
            # (when j is already colored the cycle closed consistently)
    # entry switches: input k<m rides subnet color[inv[k]]; swap iff the
    # low lane's element belongs to the lower subnet
    in_sw = (color[inv[np.arange(m)]] == 1).astype(np.uint8)
    out_sw = (color[:m] == 1).astype(np.uint8)
    exit_stage = N_STAGES - 1 - stage0
    out[stage0, lane0:lane0 + m] = in_sw
    out[stage0, lane0 + m:lane0 + length] = in_sw
    out[exit_stage, lane0:lane0 + m] = out_sw
    out[exit_stage, lane0 + m:lane0 + length] = out_sw
    # sub-permutations: subnet 0 occupies lanes [0, m), subnet 1 [m, 2m).
    # After the entry stage, input a sits at slot (a mod m) of subnet
    # color[inv[a]]. Output j's element exits subnet color[j] at slot
    # (j mod m) before the exit stage.
    sub = np.empty((2, m), np.int64)
    for j in range(length):
        sub[color[j], j % m] = perm[j] % m
    _route(sub[0], out, stage0 + 1, lane0, depth - 1)
    _route(sub[1], out, stage0 + 1, lane0 + m, depth - 1)


def route_block(perm: np.ndarray) -> np.ndarray:
    """Switch bits [N_STAGES, W] (uint8) realizing out[j] = in[perm[j]]
    for one W-lane block."""
    perm = np.asarray(perm, np.int64)
    assert perm.shape == (W,), perm.shape
    out = np.zeros((N_STAGES, W), np.uint8)
    _route(perm, out, 0, 0, 6)
    return out


def apply_switches(x: np.ndarray, sw: np.ndarray) -> np.ndarray:
    """Oracle stage-by-stage execution on the lane (last) axis."""
    x = np.asarray(x)
    lanes = np.arange(W)
    for t, m in enumerate(STAGE_SHIFTS):
        partner = x[..., lanes ^ m]
        take = sw[t].astype(bool)
        x = np.where(take, partner, x)
    return x


def route_blocks(perms: np.ndarray) -> np.ndarray:
    """Vector of blocks [..., W] → packed 13-bit switch words [..., W]
    (int32, bit t = stage t switch at that lane)."""
    perms = np.asarray(perms, np.int64)
    flat = perms.reshape(-1, W)
    words = np.zeros(flat.shape, np.int32)
    for idx in range(flat.shape[0]):
        sw = route_block(flat[idx])
        words[idx] = np.sum(sw.astype(np.int32)
                            << np.arange(N_STAGES, dtype=np.int32)[:, None],
                            axis=0)
    return words.reshape(perms.shape)


def pack_bfly_words(p0: np.ndarray, s: np.ndarray, p2: np.ndarray
                    ) -> np.ndarray:
    """Pack a hierarchical stage table's three components (as produced by
    ops/benes routing: per-block source shuffles p0, exchange selector s
    with ABSOLUTE source-block ids, per-block placements p2 — all [R, C]
    with C = B*W) into one int32 word per element (layout in the module
    docstring). The exchange is stored as delta = (s - block(c)) mod B so
    the kernel realizes it with circular rolls by multiples of W."""
    r, c = p0.shape
    assert c % W == 0
    b = c // W
    assert b <= 16, "exchange delta needs 4 bits"
    a_words = route_blocks(np.asarray(p0, np.int64).reshape(r, b, W) % W)
    b_words = route_blocks(np.asarray(p2, np.int64).reshape(r, b, W) % W)
    blk = np.arange(c, dtype=np.int64) // W
    delta = ((np.asarray(s, np.int64) - blk[None, :]) % b).astype(np.int32)
    return (a_words.reshape(r, c)
            | (delta << N_STAGES)
            | (b_words.reshape(r, c) << (N_STAGES + 4))).astype(np.int32)


def route_rows_bfly(p: np.ndarray, w: int = W) -> np.ndarray:
    """Route each row of ``p`` ([NR, L], each a permutation of range(L))
    through a [B, W] Clos with butterfly in-block stages; returns packed
    int32 words [NR, L] (pack_bfly_words layout). NumPy oracle of the
    native csrc implementation."""
    from ihgnn_tpu.ops.benes import benes_route_rect
    p = np.asarray(p, np.int64)
    nr, length = p.shape
    b = length // w
    assert length % w == 0 and b <= 16, (length, w)
    p0 = np.empty((nr, length), np.int64)
    s = np.empty((nr, length), np.int64)
    p2 = np.empty((nr, length), np.int64)
    for r in range(nr):
        q0, q1, q2 = benes_route_rect(p[r], b, w)
        p0[r] = q0.reshape(-1)
        s[r] = q1.T.reshape(-1)
        p2[r] = q2.reshape(-1)
    return pack_bfly_words(p0 % w, s, p2 % w)
