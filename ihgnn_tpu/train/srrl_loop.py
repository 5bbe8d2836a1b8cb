"""Srrl alternating KG/PS training loop.

Per epoch (TrainTestHelper.py:160-255): ``ceil(P/B)`` KG steps — mode
rotating tail→head→query company, logsigmoid pos/neg losses with word2vec
subsampling weights — then a full PS pass with pointwise BCE. One step
function per KG mode keeps branching static under jit.

Optimizer parity: torch uses a SINGLE Adam (Main.py:192) whose per-param
moments and step counters advance only when that param received a
gradient in the step (params with grad=None are skipped). Replicated by
``_phase_adam``: one shared optimizer state over the full param tree with
per-leaf step counters; each phase's transformation advances exactly its
mask's leaves. The KG vocab table (trained un-detached by BOTH phases,
Srrl.py:120) thus shares one set of moments across phases, as in torch —
round 2 used two ``optax.masked`` Adams with split vocab moments, which
measurably lagged the reference replay.

L2-regularization quirk preserved: the reference computes the penalty from
``weight.data`` (detached) and multiplies the coefficient twice
(TrainTestHelper.py:203-210, 237-244) — it inflates the reported loss but
contributes no gradient; replicated via stop_gradient.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ihgnn_tpu.config import Config
from ihgnn_tpu.data.dataset import (EvalLogs, GraphData, TrainSampler,
                                    prefetch)
from ihgnn_tpu.data.srrl_sampler import MetaPaths, SrrlKGSampler
from ihgnn_tpu.models.srrl import KG_MODES, Srrl
from ihgnn_tpu.train.eval import evaluate, make_eval_fns
from ihgnn_tpu.train.metrics import MetricsCollection
from ihgnn_tpu.train.train import bce_with_logits
from ihgnn_tpu.utils.logging import log_print


@struct.dataclass
class SrrlTrainState:
    params: Any
    opt_state: Any         # ONE Adam state shared by both phases (torch)
    step: jnp.ndarray


def _path_has(path, *names) -> bool:
    keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    return any(k in names for k in keys)


def _phase_masks(params):
    """(kg_mask, ps_mask) boolean pytrees of which params each phase trains."""
    def kg_leaf(path, _):
        return _path_has(path, "KG", "kg_aggre_head", "kg_aggre_query",
                         "kg_aggre_tail", "kg_mlp_pre")

    def ps_leaf(path, _):
        if _path_has(path, "PS", "g_u", "g_i", "ps_mlp_uq", "ps_mlp_ui",
                     "ps_mlp_pred", "prediction"):
            return True
        # KG vocab table: queries are embedded un-detached in the PS phase
        return _path_has(path, "KG") and _path_has(path, "vocab_table")

    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    kg = jax.tree_util.tree_unflatten(tree, [kg_leaf(p, l) for p, l in flat])
    ps = jax.tree_util.tree_unflatten(tree, [ps_leaf(p, l) for p, l in flat])
    return kg, ps


def _phase_adam(lr: float, mask, b1=0.9, b2=0.999, eps=1e-8):
    """Adam whose state spans the FULL param tree but whose moments and
    per-leaf step counters advance only at mask-True leaves — torch's
    single-optimizer semantics where grad-less params are skipped
    (torch.optim.Adam per-param state['step']). Two phase transformations
    built over the same param tree share ONE state object."""

    def init(params):
        return (jax.tree.map(jnp.zeros_like, params),              # mu
                jax.tree.map(jnp.zeros_like, params),              # nu
                jax.tree.map(lambda _: jnp.zeros((), jnp.int32),
                             params))                              # steps

    def update(grads, state, params=None):
        mu, nu, cnt = state
        new_mu = jax.tree.map(
            lambda m, g, v: b1 * v + (1 - b1) * g if m else v,
            mask, grads, mu)
        new_nu = jax.tree.map(
            lambda m, g, v: b2 * v + (1 - b2) * g * g if m else v,
            mask, grads, nu)
        new_cnt = jax.tree.map(lambda m, c: c + 1 if m else c, mask, cnt)

        def upd(m, g, mu_l, nu_l, c):
            if not m:
                return jnp.zeros_like(g)
            t = c.astype(jnp.float32)
            mu_hat = mu_l / (1 - b1 ** t)
            nu_hat = nu_l / (1 - b2 ** t)
            return -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)

        updates = jax.tree.map(upd, mask, grads, new_mu, new_nu, new_cnt)
        return updates, (new_mu, new_nu, new_cnt)

    return optax.GradientTransformation(init, update)


def make_srrl_optimizers(cfg: Config, params):
    kg_mask, ps_mask = _phase_masks(params)
    tx_kg = _phase_adam(cfg.train.learning_rate, kg_mask)
    tx_ps = _phase_adam(cfg.train.learning_rate, ps_mask)
    return tx_kg, tx_ps


def _kg_reg_term(params, coeff: float) -> jnp.ndarray:
    if coeff == 0.0:
        return jnp.zeros(())
    kg = params["params"]["KG"]
    norms = (jnp.sum(kg["user_table"] ** 2) + jnp.sum(kg["vocab_table"] ** 2)
             + jnp.sum(kg["item_table"] ** 2))
    return jax.lax.stop_gradient(coeff * coeff * norms)


def make_kg_steps(model: Srrl, query_words, query_word_counts, tx_kg, cfg: Config):
    """One jitted step function per KG mode."""
    uni_weight = cfg.model.srrl_uni_weight
    reg = cfg.model.srrl_regularization

    def build(mode):
        def loss_fn(params, triples, negs, weights, company):
            neg_scores = model.apply(params, triples, negs, company, mode,
                                     query_words, query_word_counts,
                                     method=model.trainkg)
            neg_score = jax.nn.log_sigmoid(-neg_scores).mean(axis=1)
            pos_scores = model.apply(params, triples, None, company, mode,
                                     query_words, query_word_counts,
                                     method=model.trainkg)
            pos_score = jax.nn.log_sigmoid(pos_scores)[:, 0]
            if uni_weight:
                pos_loss, neg_loss = -pos_score.mean(), -neg_score.mean()
            else:
                wsum = weights.sum()
                pos_loss = -(weights * pos_score).sum() / wsum
                neg_loss = -(weights * neg_score).sum() / wsum
            return (pos_loss + neg_loss) / 2 + _kg_reg_term(params, reg)

        def step(state: SrrlTrainState, triples, negs, weights, company):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, triples, negs, weights, company)
            updates, opt_state = tx_kg.update(grads, state.opt_state,
                                              state.params)
            params = optax.apply_updates(state.params, updates)
            return dataclasses.replace(state, params=params,
                                       opt_state=opt_state,
                                       step=state.step + 1), loss

        return jax.jit(step)

    return {mode: build(mode) for mode in KG_MODES}


def make_ps_step(model: Srrl, query_words, query_word_counts, tx_ps, cfg: Config):
    reg = cfg.model.srrl_regularization

    def ps_reg(params):
        if reg == 0.0:
            return jnp.zeros(())
        p = params["params"]
        norms = (jnp.sum(p["PS"]["user_table"] ** 2)
                 + jnp.sum(p["KG"]["vocab_table"] ** 2)
                 + jnp.sum(p["PS"]["item_table"] ** 2))
        return jax.lax.stop_gradient(reg * reg * norms)

    def loss_fn(params, batch):
        logits = model.apply(params, query_words, query_word_counts,
                             batch.users, batch.queries, batch.items)
        return bce_with_logits(logits, batch.flags, batch.weight) + ps_reg(params)

    def step(state: SrrlTrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx_ps.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return dataclasses.replace(state, params=params, opt_state=opt_state,
                                   step=state.step + 1), loss

    return jax.jit(step)


def init_srrl(cfg: Config, data: GraphData, rng) -> Tuple[Srrl, SrrlTrainState, Any, Any]:
    model = Srrl(cfg=cfg.model, user_count=data.user_count,
                 query_count=data.query_count, item_count=data.item_count,
                 vocab_size=data.vocab_size,
                 prediction="mlp")
    params = jax.jit(lambda r: model.init(r, data.query_words,
                                          data.query_word_counts,
                                          method=model.init_all))(rng)
    tx_kg, tx_ps = make_srrl_optimizers(cfg, params)
    # both phase transforms init identically (full-tree mu/nu/steps) and
    # SHARE the one state — torch's single Adam (Main.py:192)
    state = SrrlTrainState(params=params, opt_state=tx_kg.init(params),
                           step=jnp.zeros((), jnp.int32))
    return model, state, tx_kg, tx_ps


def run_srrl(cfg: Config, data: GraphData, valid: EvalLogs, test: EvalLogs,
             result_dir: str, fn_metrics: str) -> MetricsCollection:
    """The Srrl branch of the experiment driver."""
    import os

    from ihgnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from ihgnn_tpu.train.controller import EpochSchedule

    t = cfg.train
    model, state, tx_kg, tx_ps = init_srrl(cfg, data, jax.random.key(t.seed))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log_print(f"Srrl parameters: {n_params}")

    epoch_start = 1
    if cfg.io.checkpoint:
        epoch_ckpt, state = restore_checkpoint(result_dir, cfg.io.checkpoint,
                                               jax.device_get(state))
        epoch_start = epoch_ckpt + 1
        log_print(f"restored checkpoint at epoch {epoch_ckpt}")

    meta = MetaPaths(data)
    kg_sampler = SrrlKGSampler(meta, t.batch_size, t.negative_sample_size,
                               seed=t.seed)
    ps_sampler = TrainSampler(data, t.batch_size, t.random_negative_sample_size,
                              t.non_random_negative_sample_size, seed=t.seed)
    kg_steps = make_kg_steps(model, data.query_words, data.query_word_counts,
                             tx_kg, cfg)
    ps_step = make_ps_step(model, data.query_words, data.query_word_counts,
                           tx_ps, cfg)
    features_fn, metrics_fn = make_eval_fns_srrl(model, data)

    schedule = EpochSchedule(
        t.epoch_count, epoch_start, t.epoch_start_test, t.epoch_test_frequency,
        t.epoch_count if cfg.io.store_checkpoint else None,
        1000000 if cfg.io.store_checkpoint else None)
    all_metrics = MetricsCollection(t.use_valid_dataset)

    # Srrl-MLP eval materializes [B, I, 2d]; bound B accordingly
    eval_bs = max(1, min(t.eval_batch_size,
                         (1 << 27) // max(data.item_count * 2
                                          * cfg.model.embedding_size, 1)))

    for epoch in schedule.epochs:
        t0 = time.time()
        if cfg.model.srrl_kg_loss:
            kg_losses = []
            for _ in range(kg_sampler.steps_per_epoch):
                mode, triples, negs, weights, company = kg_sampler.next()
                state, loss = kg_steps[mode](state, triples, negs, weights, company)
                kg_losses.append(loss)
            log_print(f"[Epoch KG {epoch}] avg loss KG-> "
                      f"{np.mean([float(l) for l in kg_losses]):.4f} "
                      f"in {time.time()-t0:.2f}s")

        t1 = time.time()
        ps_losses = []
        for batch in prefetch(ps_sampler.epoch()):
            state, loss = ps_step(state, batch)
            ps_losses.append(loss)
        avg_loss = float(np.mean([float(l) for l in ps_losses]))
        schedule.record_train_seconds(time.time() - t0)
        log_print(f"[Epoch PS {epoch}] avg loss {avg_loss:.4f} <-PS "
                  f"in {time.time()-t1:.2f}s "
                  f"(remaining {schedule.remaining_text(epoch)})")

        if schedule.is_store_epoch(epoch):
            name = save_checkpoint(result_dir, epoch, jax.device_get(state))
            log_print(f"checkpoint saved: {name}")

        if schedule.is_test_epoch(epoch):
            feats = features_fn(state.params)
            m_t, _, time_t = evaluate(state.params, features_fn, metrics_fn,
                                      test, eval_bs, features=feats)
            log_print(f"test done in {time_t:.2f}s over {test.count} logs")
            log_print(m_t.to_string(), put_time_in_single_line=True)
            if t.use_valid_dataset:
                m_v, _, time_v = evaluate(state.params, features_fn, metrics_fn,
                                          valid, eval_bs, features=feats)
                log_print(m_v.to_string(), put_time_in_single_line=True)
                all_metrics.add(epoch, m_t, m_v)
                schedule.record_eval_seconds(time_t + time_v)
            else:
                all_metrics.add(epoch, m_t)
                schedule.record_eval_seconds(time_t)
            if cfg.io.store_metrics:
                with open(os.path.join(result_dir, fn_metrics), "a",
                          encoding="utf-8") as f:
                    f.write(f"Epoch {epoch} Avg loss {avg_loss:.4f}\n"
                            f"{m_t.to_string()}\n")

    from ihgnn_tpu.cli import report_best
    report_best(cfg, all_metrics, result_dir, fn_metrics)
    return all_metrics


def make_eval_fns_srrl(model: Srrl, data: GraphData):
    @jax.jit
    def features_fn(params):
        return model.apply(params, data.query_words, data.query_word_counts,
                           method=model.all_features)

    from ihgnn_tpu.train.metrics import ranking_metrics

    @jax.jit
    def metrics_fn(params, features, users, queries, truth, truth_counts):
        scores = model.apply(params, features, users, queries,
                             method=model.score_all_items)
        return ranking_metrics(scores, truth, truth_counts)

    return features_fn, metrics_fn
