"""Controlled layer-zoo parity: identical weights + identical batches
through our jax RawGnn and a torch replay of the reference layer math,
comparing per-step training losses (VERDICT r3 item 8 — extends the
tools/srrl_bitcheck.py pattern to GCN / GAT / HGCN / IHGNN+phase-2).

The statistical PARITY table (tools/quality_parity.py) can't pin layer
quirks — different RNG streams hide a wrong LeakyReLU gain or a
transform-order bug inside seed spread. Here the torch side receives OUR
initialized weights verbatim and trains on the SAME batches, so any
formula divergence shows up as a per-step loss gap.

Replayed reference semantics (file:line into /root/reference):
* GCN: sym-norm Dv^-1/2 A Dv^-1/2 X W, transform-first when
  in_dim >= out_dim (Models/GnnLayers.py:28-45); A coalesce-summed
  symmetric COO (Helpers/Graph.py:40-63; entries reused from our builder,
  whose construction parity is pinned by tests/test_graph.py goldens).
* GAT: x' = Linear(x); per-edge score LeakyReLU(Linear([x'_src ; x'_dst]))
  (concat head), softmax per destination (dgl edge_softmax), weighted
  source sum (u_mul_e_sum) (Models/GnnLayers.py:65-115).
* HGCN: Dv^-1/2 H De^-1 Hᵀ Dv^-1/2 X W with De = 3
  (Models/GnnLayers.py:142-153).
* IHGNN phase-2 attention: edge features from the order-3/1 interactor
  (Models/CommonLayers.py:58-85), then a GAT over the bipartite
  (edge-nodes ∪ nodes) incidence graph; node update = attention output
  rows [0, N) (Models/GnnLayers.py:158-230).
* head/loss: HEM score + BCEWithLogits + Adam lr 1e-3
  (Models/PredictionLayers.py:30-44, Main.py:191-192).

Usage: python tools/layers_bitcheck.py [--gnn gcn|gat|hgcn|phase2|all]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

U, Q, I, V = 40, 25, 60, 30
D = 16
P = 400          # positive interactions
B, K = 32, 10    # batch positives, negatives per positive
LW = 4           # words per query


def synth(seed=0):
    rng = np.random.default_rng(seed)
    uqif = np.stack([
        rng.integers(0, U, P), rng.integers(0, Q, P),
        rng.integers(0, I, P), np.ones(P, np.int64)], axis=1)
    qw = np.zeros((Q, LW), np.int32)
    qc = rng.integers(1, LW + 1, Q).astype(np.int32)
    for qi in range(Q):
        qw[qi, :qc[qi]] = rng.integers(1, V + 1, qc[qi])
    return uqif, qw, qc


def make_batches(uqif, steps, seed=1):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        idx = rng.integers(0, P, B)
        pu, pq, pi = uqif[idx, 0], uqif[idx, 1], uqif[idx, 2]
        nu, nq = np.repeat(pu, K), np.repeat(pq, K)
        ni = rng.integers(0, I, B * K)
        batches.append((
            np.concatenate([pu, nu]).astype(np.int32),
            np.concatenate([pq, nq]).astype(np.int32),
            np.concatenate([pi, ni]).astype(np.int32),
            np.concatenate([np.ones(B, np.float32),
                            np.zeros(B * K, np.float32)])))
    return batches


# ---------------------------------------------------------------------------
# torch replay
# ---------------------------------------------------------------------------


class LayerZooReplay:
    """RawGnn with a configurable gnn layer, torch tensors, weights COPIED
    from the jax model (no init parity needed here)."""

    def __init__(self, gnn, params, graphs, qw, qc, layers=2):
        import torch
        self.t = torch
        self.gnn = gnn
        self.L = layers
        self.qw = torch.from_numpy(qw.astype(np.int64))
        self.qmask = (self.qw > 0).float()
        self.qcount = torch.from_numpy(
            np.maximum(qc, 1).astype(np.float32))[:, None]
        self.graphs = graphs   # dict of numpy structure arrays

        p = params["params"]

        def t_(x):
            return torch.from_numpy(np.asarray(x, np.float32).copy()
                                    ).requires_grad_(True)

        emb = p["embeddings"]
        # ihgnn_tpu stores embedding tables feature-major [d, rows]
        # (models/embedding.py); the torch replay is row-major
        self.user_table = t_(np.asarray(emb["user_table"]).T)
        self.item_table = t_(np.asarray(emb["item_table"]).T)
        self.vocab_table = t_(np.asarray(emb["vocab_table"]).T)
        self.item_bias = t_(p["prediction"]["items_bias"])
        self.layers = []
        for li in range(layers):
            lp = p[f"gnn_{li}"]
            lw = {"tk": t_(lp["feature_transform"]["dense"]["kernel"]),
                  "tb": t_(lp["feature_transform"]["dense"]["bias"])}
            if gnn == "gat":
                lw["ak"] = t_(lp["gat"]["feature_aggregate"]["kernel"])
                lw["ab"] = t_(lp["gat"]["feature_aggregate"]["bias"])
            elif gnn == "phase2":
                agg = lp["interactor"]["aggregation"]
                ik = agg["dense"]["kernel"] if "dense" in agg else agg["kernel"]
                ib = agg["dense"]["bias"] if "dense" in agg else agg["bias"]
                lw["ik"], lw["ib"] = t_(ik), t_(ib)
                lw["pk"] = t_(lp["phase2_transform"]["dense"]["kernel"])
                lw["pb"] = t_(lp["phase2_transform"]["dense"]["bias"])
                lw["ak"] = t_(lp["phase2_gat"]["feature_aggregate"]["kernel"])
                lw["ab"] = t_(lp["phase2_gat"]["feature_aggregate"]["bias"])
            self.layers.append(lw)

    def parameters(self):
        ps = [self.user_table, self.item_table, self.vocab_table,
              self.item_bias]
        for lw in self.layers:
            ps.extend(lw.values())
        return ps

    def _segment_softmax(self, scores, dst, n_seg):
        t = self.t
        # dgl edge_softmax: per-destination max-shifted softmax
        seg_max = t.full((n_seg,), -t.inf).index_reduce(
            0, dst, scores, "amax", include_self=False)
        ex = t.exp(scores - seg_max[dst])
        denom = t.zeros(n_seg).index_add(0, dst, ex)
        return ex / denom[dst]

    def _layer(self, x, lw):
        t = self.t
        g = self.graphs
        xp = x @ lw["tk"] + lw["tb"]
        if self.gnn == "gcn":
            # conv(transform(x)): transform-first since in_dim == out_dim
            # (GnnLayers.py:33-43 picks transform-first when in >= out)
            dis = g["dv"] ** -0.5                           # [N, 1]
            h = dis * xp
            row, col = g["row"], g["col"]
            agg = t.zeros_like(h).index_add(
                0, row, g["val"][:, None] * h[col])
            return dis * agg
        if self.gnn == "hgcn":
            dis = g["dv"] ** -0.5
            h = dis * xp
            i3 = g["i3"]
            edge = (h[i3[:, 0]] + h[i3[:, 1]] + h[i3[:, 2]]) / 3.0
            agg = t.zeros_like(h)
            for r in range(3):
                agg = agg.index_add(0, i3[:, r], edge)
            return dis * agg
        if self.gnn == "gat":
            src, dst = g["src"], g["dst"]
            pair = t.cat([xp[src], xp[dst]], dim=1)
            scores = t.nn.functional.leaky_relu(
                pair @ lw["ak"] + lw["ab"], 0.01)[:, 0]
            w = self._segment_softmax(scores, dst, xp.shape[0])
            return t.zeros_like(xp).index_add(0, dst, xp[src] * w[:, None])
        # phase2: interactor edge features + bipartite GAT
        i3 = g["i3"]
        u, q, i = xp[i3[:, 0]], xp[i3[:, 1]], xp[i3[:, 2]]
        parts = [u, q, i]
        if lw["ik"].shape[0] >= 6 * u.shape[1]:
            parts += [u * q, q * i, i * u]
        if lw["ik"].shape[0] >= 7 * u.shape[1]:
            parts += [u * q * i]
        e = t.cat(parts, dim=1) @ lw["ik"] + lw["ib"]
        n = xp.shape[0]
        both = t.cat([xp, e], dim=0) @ lw["pk"] + lw["pb"]
        src = g["inc_edge"] + n
        dst = g["inc_node"]
        pair = t.cat([both[src], both[dst]], dim=1)
        scores = t.nn.functional.leaky_relu(
            pair @ lw["ak"] + lw["ab"], 0.01)[:, 0]
        w = self._segment_softmax(scores, dst, n + e.shape[0])
        out = t.zeros_like(both).index_add(0, dst, both[src] * w[:, None])
        return out[:n]

    def all_features(self):
        t = self.t
        users = self.user_table[1:]
        items = self.item_table[1:]
        bags = self.vocab_table[self.qw]
        queries = (bags * self.qmask[..., None]).sum(1) / self.qcount
        x = t.cat([users, queries, items], dim=0)
        outs = [x]
        for lw in self.layers:
            x = self._layer(x, lw)
            outs.append(x)
        return t.cat(outs, dim=1)

    def loss(self, users, queries, items, labels):
        t = self.t
        f = self.all_features()
        uf = f[users]
        qf = f[U + queries]
        itf = f[U + Q + items]
        logits = (itf * (0.5 * qf + 0.5 * uf)).sum(1) + self.item_bias[items]
        return t.nn.functional.binary_cross_entropy_with_logits(
            logits, labels)


def run_one(gnn, steps=6, seed=0, verbose=True):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from ihgnn_tpu.config import Config, ModelConfig, TrainConfig, V as CV
    from ihgnn_tpu.data.dataset import Batch
    from ihgnn_tpu.graph import build_graph2d, build_hypergraph
    from ihgnn_tpu.models.rawgnn import RawGnn
    from ihgnn_tpu.train.train import (TrainState, init_state, make_optimizer,
                                       make_train_step)

    uqif, qw, qc = synth(seed)
    n = U + Q + I
    gnn_cfg = {"gcn": CV.GCN, "gat": CV.GAT, "hgcn": CV.HGCN,
               "phase2": CV.IHGNN}[gnn]
    cfg = Config(model=ModelConfig(embedding_size=D, gnn_layer_count=2,
                                   gnn=gnn_cfg,
                                   phase2_attention=(gnn == "phase2")),
                 train=TrainConfig(batch_size=B,
                                   random_negative_sample_size=K))
    if gnn in ("gcn", "gat"):
        graph = build_graph2d(uqif, n, U, Q)
    else:
        graph = build_hypergraph(uqif, n, U, Q, pack_kernels=False)

    model = RawGnn(cfg=cfg.model, user_count=U, query_count=Q, item_count=I,
                   vocab_size=V)
    tx = make_optimizer(cfg)
    state = init_state(model, jax.random.key(seed), graph, qw, qc, cfg, tx)
    step = make_train_step(model, graph, qw, qc, tx)

    # torch replay with our weights + graph structure
    graphs = {"dv": torch.from_numpy(np.asarray(graph.dv, np.float32))}
    if gnn in ("gcn", "gat"):
        graphs["row"] = torch.from_numpy(graph.row.astype(np.int64))
        graphs["col"] = torch.from_numpy(graph.col.astype(np.int64))
        graphs["val"] = torch.from_numpy(graph.val.astype(np.float32))
        # GAT iterates destination-sorted entries (our layer's dst_order)
        graphs["src"] = torch.from_numpy(
            graph.row[graph.dst_order].astype(np.int64))
        graphs["dst"] = torch.from_numpy(
            graph.col[graph.dst_order].astype(np.int64))
    else:
        graphs["i3"] = torch.from_numpy(graph.i3.astype(np.int64))
        graphs["inc_node"] = torch.from_numpy(graph.inc_node.astype(np.int64))
        graphs["inc_edge"] = torch.from_numpy(graph.inc_edge.astype(np.int64))
    params_host = jax.device_get(state.params)
    rep = LayerZooReplay(gnn, params_host, graphs, qw, qc)
    opt = torch.optim.Adam(rep.parameters(), lr=1e-3)

    batches = make_batches(uqif, steps, seed + 1)
    max_gap, rows = 0.0, []
    for s, (bu, bq, bi, bl) in enumerate(batches):
        batch = Batch(users=bu, queries=bq, items=bi, flags=bl,
                      weight=np.ones(bu.shape[0], np.float32))
        state, loss_j = step(state, jax.device_put(batch))
        loss_j = float(loss_j)

        lt = rep.loss(torch.from_numpy(bu.astype(np.int64)),
                      torch.from_numpy(bq.astype(np.int64)),
                      torch.from_numpy(bi.astype(np.int64)),
                      torch.from_numpy(bl))
        opt.zero_grad()
        lt.backward()
        opt.step()
        loss_t = float(lt)

        gap = abs(loss_j - loss_t)
        max_gap = max(max_gap, gap)
        rows.append((s, loss_j, loss_t, gap))
        tol = 2e-5 if s < 2 else 1e-3
        if verbose:
            print(f"  step {s}: ours {loss_j:.7f} replay {loss_t:.7f} "
                  f"|d| {gap:.2e}", flush=True)
        assert gap <= tol, (gnn, s, loss_j, loss_t, gap)
    return max_gap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gnn", default="all",
                    choices=["gcn", "gat", "hgcn", "phase2", "all"])
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()
    kinds = (["gcn", "gat", "hgcn", "phase2"] if args.gnn == "all"
             else [args.gnn])
    for g in kinds:
        print(f"== {g} ==", flush=True)
        gap = run_one(g, steps=args.steps)
        print(f"LAYER BITCHECK OK [{g}] max|loss gap| = {gap:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
