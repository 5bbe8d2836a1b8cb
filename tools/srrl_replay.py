"""Srrl reference-formula replay: a torch-CPU reimplementation of the
reference's Srrl alternating KG/PS training loop, used ONLY as a
quality-parity oracle (VERDICT r2 item 4 — PARITY.json 'srrl' section).

The actual reference cannot run in this image (needs torch_sparse/dgl at
import time via Helpers/Torches), so this replays its exact math from the
surveyed formulas; every step cites the reference file:line. No reference
code is copied.

Replayed semantics (Gs defaults: KG_loss=True, uni_weight=False,
regularization=0, prediction_layer_type=None → 3-MLP scorer,
Main.py:176-181, Helpers/GlobalSettings.py:87-91):

* two embedding spaces KG (user+item+vocab) and PS (user+item), tables
  (count+1, d) xavier-uniform then row-L2-normalized (Srrl.py:33-48,
  236-237); queries = word-bag mean over the KG vocab table
  (EmbeddingLayers.py:79-91).
* heads: Aggregation(2d→d) = Linear+LeakyReLU, MLP(2d→d) =
  Linear(2d,2d)+LeakyReLU+Linear(2d,d) (CommonLayers.py:7-26); xavier-
  NORMAL kernels, zero biases for every non-embedding param
  (Srrl.py:239-252).
* KG phase: ceil(P/B) steps/epoch (Main.py:183-187), mode rotation
  tail→head→query company (SrrlDataset.py:190-213, per-mode shuffled
  epochs), 10 uniform negative items (SrrlDataset.py:112), subsampling
  weight sqrt(1/(3+count(u,q))) (SrrlDataset.py:97-109), one random true
  company per relation (SrrlDataset.py:159-170); loss
  −(w·logσ(pos)+w·logσ(−neg))/2w (TrainTestHelper.py:185-201); scoring
  via trans_u_q_i_i2 / trans_u_u2_q_i / trans_u_q_q2_i (Srrl.py:195-234,
  incl. the negative-tail quirk where the company is the POSITIVE item,
  Srrl.py:187).
* PS phase: full pass of (100 pos + 10 random neg each) batches, fused
  latents u/i = Aggregation(normalize(cat(ps, detach(kg)))) (Srrl.py:
  113-127), 3-MLP scorer (Srrl.py:154-158), BCEWithLogits.
* ONE Adam (lr 1e-3) over all params for both phases (Main.py:192);
  torch skips grad-less params per step. No LR decay (the ×0.98 rule is
  RawGnn-only, TrainTestHelper.py:155).
* eval: rank ALL items per test log, reference metric math
  (Helpers/Metrics.py:60-109) + MRR@10.

Usage:
  python tools/srrl_replay.py --dataset /tmp/parity_ds --epochs 40 --seed 0
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def l2n(t, dim=-1):
    import torch.nn.functional as F
    return F.normalize(t, dim=dim)


class SrrlReplay:
    def __init__(self, U, Q, I, V, d, qw, qc, generator):
        import torch

        self.torch = torch
        t = torch
        self.U, self.Q, self.I, self.d = U, Q, I, d
        g = generator
        self.qw = t.from_numpy(qw.astype(np.int64))
        self.qmask = (self.qw > 0).float()
        self.qcount = t.from_numpy(np.maximum(qc, 1).astype(np.float32))[:, None]

        def table(rows):
            w = t.empty(rows, d)
            t.nn.init.xavier_uniform_(w, generator=g)
            return l2n(w, dim=1).clone().requires_grad_(True)   # Srrl.py:236-237

        self.kg_user = table(U + 1)
        self.kg_item = table(I + 1)
        self.kg_vocab = table(V + 1)
        self.ps_user = table(U + 1)
        self.ps_item = table(I + 1)

        def linear(inp, out):
            # xavier_normal_ kernel + zero bias (Srrl.py:239-252)
            k = t.empty(out, inp)
            t.nn.init.xavier_normal_(k, generator=g)
            b = t.zeros(out)
            return k.requires_grad_(True), b.requires_grad_(True)

        def mlp(inp, out):
            return linear(inp, inp), linear(inp, out)

        self.kg_aggre_head = linear(2 * d, d)
        self.kg_aggre_query = linear(2 * d, d)
        self.kg_aggre_tail = linear(2 * d, d)
        self.kg_mlp_pre = mlp(2 * d, d)
        self.g_u = linear(2 * d, d)
        self.g_i = linear(2 * d, d)
        self.ps_mlp_uq = mlp(2 * d, d)
        self.ps_mlp_ui = mlp(2 * d, d)
        self.ps_mlp_pred = mlp(2 * d, 1)

    def parameters(self):
        ps = [self.kg_user, self.kg_item, self.kg_vocab, self.ps_user,
              self.ps_item]
        for lin in (self.kg_aggre_head, self.kg_aggre_query,
                    self.kg_aggre_tail, self.g_u, self.g_i):
            ps += list(lin)
        for m in (self.kg_mlp_pre, self.ps_mlp_uq, self.ps_mlp_ui,
                  self.ps_mlp_pred):
            ps += list(m[0]) + list(m[1])
        return ps

    # ---- building blocks ----

    def _lin(self, lin, x):
        k, b = lin
        return x @ k.T + b

    def _aggre(self, lin, x):                      # CommonLayers.py:18-26
        return self.torch.nn.functional.leaky_relu(self._lin(lin, x))

    def _mlp(self, m, x):                          # CommonLayers.py:7-16
        h = self.torch.nn.functional.leaky_relu(self._lin(m[0], x))
        return self._lin(m[1], h)

    def embed_query_kg(self, idx):
        bags = self.kg_vocab[self.qw[idx]]                       # [B, Lw, d]
        return (bags * self.qmask[idx][..., None]).sum(1) / self.qcount[idx]

    # ---- KG scoring (Srrl.py:176-234) ----

    def kg_score(self, mode, triples, neg_items, company):
        """[B, k] negative scores and [B, 1] positive scores, per mode.
        neg_items None → positive mode."""
        t = self.torch
        u = self.kg_user[triples[:, 0] + 1][:, None, :]          # [B,1,d]
        q = self.embed_query_kg(triples[:, 1])[:, None, :]

        if mode == "tail":
            if neg_items is None:
                items = self.kg_item[triples[:, 2] + 1][:, None, :]
                comp = self.kg_item[company + 1][:, None, :]     # true tail co.
            else:
                items = self.kg_item[neg_items + 1]              # [B,k,d]
                # negative mode: company = POSITIVE item (Srrl.py:187)
                comp = self.kg_item[triples[:, 2] + 1][:, None, :].expand_as(items)
            items_cat = self._aggre(self.kg_aggre_tail,
                                    l2n(t.cat([items, comp], -1)))
            ctx = self._mlp(self.kg_mlp_pre, l2n(t.cat([u, q], -1)))
            return (items_cat * ctx).sum(2)                      # Srrl.py:209

        if mode == "head":
            items = (self.kg_item[triples[:, 2] + 1][:, None, :]
                     if neg_items is None else self.kg_item[neg_items + 1])
            u2 = self.kg_user[company + 1][:, None, :]
            users_cat = l2n(t.cat([u, u2], -1))
            ctx = self._mlp(self.kg_mlp_pre, l2n(t.cat(
                [self._aggre(self.kg_aggre_head, users_cat), q], -1)))
            return (items * ctx).sum(2)                          # Srrl.py:221

        items = (self.kg_item[triples[:, 2] + 1][:, None, :]
                 if neg_items is None else self.kg_item[neg_items + 1])
        q2 = self.embed_query_kg(company)[:, None, :]
        queries_cat = l2n(t.cat([q, q2], -1))
        ctx = self._mlp(self.kg_mlp_pre, l2n(t.cat(
            [u, self._aggre(self.kg_aggre_query, queries_cat)], -1)))
        return (items * ctx).sum(2)                              # Srrl.py:233

    # ---- PS latents + scorer (Srrl.py:113-158) ----

    def latents(self):
        t = self.torch
        u = self._aggre(self.g_u, l2n(t.cat(
            [self.ps_user[1:], self.kg_user[1:].detach()], -1)))
        i = self._aggre(self.g_i, l2n(t.cat(
            [self.ps_item[1:], self.kg_item[1:].detach()], -1)))
        q = self.embed_query_kg(t.arange(self.Q))
        return u, q, i

    def ps_scores(self, u_lat, q_lat, i_lat):
        t = self.torch
        uq = self._mlp(self.ps_mlp_uq, l2n(t.cat([u_lat, q_lat], -1)))
        ui = self._mlp(self.ps_mlp_ui, l2n(t.cat([u_lat, i_lat], -1)))
        return self._mlp(self.ps_mlp_pred,
                         l2n(t.cat([uq, ui], -1))).squeeze(-1)

    def score_all(self, u_all, q_all, i_all, user, query):
        t = self.torch
        u = u_all[user][None, :].expand(self.I, -1)
        q = q_all[query][None, :].expand(self.I, -1)
        return self.ps_scores(u, q, i_all)


def main():
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from reference_replay import eval_metrics, load_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--emb", type=int, default=32)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--negatives", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    data, valid, test = load_dataset(args.dataset)
    U, Q, I, V = (data.user_count, data.query_count, data.item_count,
                  data.vocab_size)
    pos = data.pos_uqif[:, :3].astype(np.int64)
    P = pos.shape[0]

    # meta-path pools (SrrlDataset.py:22-76): deduped company lists
    pt, ph, pq = {}, {}, {}
    for u, q, i in pos:
        pt.setdefault((u, q), set()).add(i)
        ph.setdefault((q, i), set()).add(u)
        pq.setdefault((u, i), set()).add(q)
    pt = {k: list(v) for k, v in pt.items()}
    ph = {k: list(v) for k, v in ph.items()}
    pq = {k: list(v) for k, v in pq.items()}
    # subsampling freq 3 + count(u,q) (SrrlDataset.py:97-109)
    freq = {}
    for u, q, _ in pos:
        freq[(u, q)] = freq.get((u, q), 3) + 1
    weights_all = np.asarray([math.sqrt(1.0 / freq[(u, q)])
                              for u, q, _ in pos], np.float32)

    g = torch.Generator().manual_seed(args.seed)
    model = SrrlReplay(U, Q, I, V, args.emb, data.query_words,
                       data.query_word_counts, g)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)   # Main.py:192
    bce = torch.nn.BCEWithLogitsLoss()
    rng = np.random.default_rng(args.seed)

    srrl_steps = -(-P // args.batch)                         # Main.py:183-187
    modes = ("tail", "head", "query")
    # per-mode shuffled epoch iterators (DataLoader(shuffle=True) per mode)
    perms = {m: iter(()) for m in modes}

    def next_batch(mode):
        out = []
        while len(out) < args.batch:
            try:
                out.append(next(perms[mode]))
            except StopIteration:
                perms[mode] = iter(rng.permutation(P))
        return np.asarray(out)

    import torch as _torch

    class ModelEval:
        """Adapter so reference_replay.eval_metrics can drive the Srrl
        scorer (it calls model.score_all(f, user, query) and
        model.all_features())."""
        torch = _torch

        def all_features(self):
            return model.latents()

        def score_all(self, f, user, query):
            u_all, q_all, i_all = f
            return model.score_all(u_all, q_all, i_all, user, query)

    best = None
    t_start = time.time()
    step_i = 0
    for epoch in range(1, args.epochs + 1):
        # ---- KG phase ----
        kg_losses = []
        for _ in range(srrl_steps):
            mode = modes[step_i % 3]                        # SrrlDataset.py:204-207
            step_i += 1
            idx = next_batch(mode)
            trip = torch.from_numpy(pos[idx])
            negs = torch.from_numpy(
                rng.integers(0, I, (args.batch, args.negatives)))
            w = torch.from_numpy(weights_all[idx])
            comp = np.empty(args.batch, np.int64)
            for r, j in enumerate(idx):
                u, q, i = pos[j]
                pool = (pt[(u, q)] if mode == "tail"
                        else ph[(q, i)] if mode == "head" else pq[(u, i)])
                comp[r] = pool[rng.integers(0, len(pool))]  # SrrlDataset.py:159-170
            comp = torch.from_numpy(comp)

            neg_score = torch.nn.functional.logsigmoid(
                -model.kg_score(mode, trip, negs, comp)).mean(dim=1)
            pos_score = torch.nn.functional.logsigmoid(
                model.kg_score(mode, trip, None, comp)).squeeze(1)
            loss = ((-(w * pos_score).sum() / w.sum())
                    + (-(w * neg_score).sum() / w.sum())) / 2
            opt.zero_grad()
            loss.backward()
            opt.step()
            kg_losses.append(float(loss))

        # ---- PS phase (TrainTestHelper.py:227-248) ----
        perm = rng.permutation(P)
        ps_losses = []
        for s in range(0, P, args.batch):
            idx = perm[s:s + args.batch]
            pu, pq_, pi = pos[idx, 0], pos[idx, 1], pos[idx, 2]
            nu = np.repeat(pu, args.negatives)
            nq = np.repeat(pq_, args.negatives)
            ni = rng.integers(0, I, nu.shape[0])
            users = torch.from_numpy(np.concatenate([pu, nu]))
            queries = torch.from_numpy(np.concatenate([pq_, nq]))
            items = torch.from_numpy(np.concatenate([pi, ni]))
            labels = torch.from_numpy(np.concatenate(
                [np.ones(len(idx), np.float32),
                 np.zeros(len(nu), np.float32)]))
            u_all, q_all, i_all = model.latents()
            logits = model.ps_scores(u_all[users], q_all[queries],
                                     i_all[items])
            loss = bce(logits, labels)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ps_losses.append(float(loss))
        avg = float(np.mean(ps_losses))

        if epoch % args.eval_every == 0 or epoch == args.epochs:
            me = ModelEval()
            mv = eval_metrics(me, valid)
            mt = eval_metrics(me, test)
            print(f"epoch {epoch}: kg {np.mean(kg_losses):.4f} ps {avg:.4f}"
                  f" valid ndcg {mv['ndcg']:.4f} test hr {mt['hr']:.4f}"
                  f" ndcg {mt['ndcg']:.4f} map {mt['map']:.4f}"
                  f" mrr {mt['mrr']:.4f}", flush=True)
            if best is None or mv["ndcg"] > best["valid"]["ndcg"]:
                best = {"epoch": epoch, "valid": mv, "test": mt}
        else:
            print(f"epoch {epoch}: kg {np.mean(kg_losses):.4f} ps {avg:.4f}",
                  flush=True)

    result = {"impl": "srrl-replay-torch", "seed": args.seed,
              "epochs": args.epochs, "best": best,
              "train_seconds": round(time.time() - t_start, 1)}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
