"""Controlled Srrl parity check: identical weights + identical batches
through BOTH implementations (ours and the torch replay), comparing the
per-step KG and PS losses. Any residual statistical-parity gap that isn't
sampling noise must show up here as a per-step numeric divergence.

Usage: python tools/srrl_bitcheck.py [--dataset /tmp/synth_ds] [--steps 6]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from ihgnn_tpu.config import Config, ModelConfig, TrainConfig
    from ihgnn_tpu.data.dataset import Batch, GraphData
    from ihgnn_tpu.train.srrl_loop import (init_srrl, make_kg_steps,
                                           make_ps_step)
    from srrl_replay import SrrlReplay

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/tmp/synth_ds")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--emb", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    data = GraphData.from_files(args.dataset, "train")
    U, Q, I, V = (data.user_count, data.query_count, data.item_count,
                  data.vocab_size)
    cfg = Config(model=ModelConfig(embedding_size=args.emb),
                 train=TrainConfig(batch_size=args.batch,
                                   random_negative_sample_size=10))

    model, state, tx_kg, tx_ps = init_srrl(cfg, data, jax.random.key(0))
    kg_steps = make_kg_steps(model, data.query_words, data.query_word_counts,
                             tx_kg, cfg)
    ps_step = make_ps_step(model, data.query_words, data.query_word_counts,
                           tx_ps, cfg)

    # ---- replay with OUR parameters copied in ----
    g = torch.Generator().manual_seed(0)
    rep = SrrlReplay(U, Q, I, V, args.emb, data.query_words,
                     data.query_word_counts, g)
    p = jax.device_get(state.params)["params"]

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    def set_(dst, src):
        with torch.no_grad():
            dst.copy_(src)

    set_(rep.kg_user, t(p["KG"]["user_table"]))
    set_(rep.kg_item, t(p["KG"]["item_table"]))
    set_(rep.kg_vocab, t(p["KG"]["vocab_table"]))
    set_(rep.ps_user, t(p["PS"]["user_table"]))
    set_(rep.ps_item, t(p["PS"]["item_table"]))

    def copy_lin(lin, tree):
        set_(lin[0], t(tree["dense"]["kernel"]).T)
        set_(lin[1], t(tree["dense"]["bias"]))

    def copy_mlp(m, tree):
        set_(m[0][0], t(tree["fc1"]["dense"]["kernel"]).T)
        set_(m[0][1], t(tree["fc1"]["dense"]["bias"]))
        set_(m[1][0], t(tree["fc2"]["dense"]["kernel"]).T)
        set_(m[1][1], t(tree["fc2"]["dense"]["bias"]))

    copy_lin(rep.kg_aggre_head, p["kg_aggre_head"]["fc"])
    copy_lin(rep.kg_aggre_query, p["kg_aggre_query"]["fc"])
    copy_lin(rep.kg_aggre_tail, p["kg_aggre_tail"]["fc"])
    copy_lin(rep.g_u, p["g_u"]["fc"])
    copy_lin(rep.g_i, p["g_i"]["fc"])
    copy_mlp(rep.kg_mlp_pre, p["kg_mlp_pre"])
    copy_mlp(rep.ps_mlp_uq, p["ps_mlp_uq"])
    copy_mlp(rep.ps_mlp_ui, p["ps_mlp_ui"])
    copy_mlp(rep.ps_mlp_pred, p["ps_mlp_pred"])

    opt = torch.optim.Adam(rep.parameters(), lr=cfg.train.learning_rate)

    # ---- identical KG batches through both ----
    pos = data.pos_uqif[:, :3].astype(np.int64)
    P_ = pos.shape[0]
    rng = np.random.default_rng(42)
    freq = {}
    for u, q, _ in pos:
        freq[(u, q)] = freq.get((u, q), 3) + 1
    pt, ph, pq = {}, {}, {}
    for u, q, i in pos:
        pt.setdefault((u, q), set()).add(i)
        ph.setdefault((q, i), set()).add(u)
        pq.setdefault((u, i), set()).add(q)
    pools = {"tail": {k: sorted(v) for k, v in pt.items()},
             "head": {k: sorted(v) for k, v in ph.items()},
             "query": {k: sorted(v) for k, v in pq.items()}}

    from ihgnn_tpu.models.srrl import KG_MODES
    modes_short = ("tail", "head", "query")
    max_diff = 0.0
    for s in range(args.steps):
        mode_i = s % 3
        idx = rng.integers(0, P_, args.batch)
        trip = pos[idx]
        negs = rng.integers(0, I, (args.batch, 10))
        w = np.asarray([np.sqrt(1.0 / freq[(u, q)]) for u, q, _ in trip],
                       np.float32)
        comp = np.empty(args.batch, np.int64)
        for r, (u, q, i) in enumerate(trip):
            key = {(0): (u, q), 1: (q, i), 2: (u, i)}[mode_i]
            pool = pools[modes_short[mode_i]][key]
            comp[r] = pool[rng.integers(0, len(pool))]

        # ours
        state, loss_j = kg_steps[KG_MODES[mode_i]](
            state, jnp.asarray(trip.astype(np.int32)),
            jnp.asarray(negs.astype(np.int32)), jnp.asarray(w),
            jnp.asarray(comp.astype(np.int32)))
        # replay
        trip_t = torch.from_numpy(trip)
        neg_score = torch.nn.functional.logsigmoid(
            -rep.kg_score(modes_short[mode_i], trip_t,
                          torch.from_numpy(negs),
                          torch.from_numpy(comp))).mean(dim=1)
        pos_score = torch.nn.functional.logsigmoid(
            rep.kg_score(modes_short[mode_i], trip_t, None,
                         torch.from_numpy(comp))).squeeze(1)
        wt = torch.from_numpy(w)
        loss_t = ((-(wt * pos_score).sum() / wt.sum())
                  + (-(wt * neg_score).sum() / wt.sum())) / 2
        opt.zero_grad(); loss_t.backward(); opt.step()
        d = abs(float(loss_j) - float(loss_t))
        max_diff = max(max_diff, d)
        print(f"KG step {s} [{modes_short[mode_i]}] ours={float(loss_j):.6f}"
              f" replay={float(loss_t):.6f} diff={d:.2e}", flush=True)

    # ---- identical PS batches ----
    for s in range(args.steps):
        idx = rng.integers(0, P_, args.batch)
        pu, pq_, pi = pos[idx, 0], pos[idx, 1], pos[idx, 2]
        ni = rng.integers(0, I, args.batch * 10)
        users = np.concatenate([pu, np.repeat(pu, 10)])
        queries = np.concatenate([pq_, np.repeat(pq_, 10)])
        items = np.concatenate([pi, ni])
        labels = np.concatenate([np.ones(args.batch, np.float32),
                                 np.zeros(args.batch * 10, np.float32)])
        batch = Batch(users=users.astype(np.int32),
                      queries=queries.astype(np.int32),
                      items=items.astype(np.int32), flags=labels,
                      weight=np.ones(len(users), np.float32))
        state, loss_j = ps_step(state, jax.device_put(batch))

        u_all, q_all, i_all = rep.latents()
        logits = rep.ps_scores(u_all[torch.from_numpy(users.astype(np.int64))],
                               q_all[torch.from_numpy(queries.astype(np.int64))],
                               i_all[torch.from_numpy(items.astype(np.int64))])
        loss_t = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, torch.from_numpy(labels))
        opt.zero_grad(); loss_t.backward(); opt.step()
        d = abs(float(loss_j) - float(loss_t))
        max_diff = max(max_diff, d)
        print(f"PS step {s} ours={float(loss_j):.6f}"
              f" replay={float(loss_t):.6f} diff={d:.2e}", flush=True)

    print(f"max |loss diff| = {max_diff:.3e}")
    assert max_diff < 5e-4, "implementations diverge"
    print("SRRL BITCHECK OK")


if __name__ == "__main__":
    main()
