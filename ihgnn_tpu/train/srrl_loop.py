"""Srrl alternating KG/PS training loop.

Per epoch (TrainTestHelper.py:160-255): ``ceil(P/B)`` KG steps — mode
rotating tail→head→query company, logsigmoid pos/neg losses with word2vec
subsampling weights — then a full PS pass with pointwise BCE. One step
function per KG mode keeps branching static under jit.

Optimizer parity note: torch uses a single Adam whose per-param moments
advance only when that param received a gradient (phase-dependent). Here
each phase gets an ``optax.masked`` Adam over exactly the params that phase
trains; the only param in both masks is the KG vocab table (the PS phase
embeds queries without detaching, Srrl.py:120), whose moments are tracked
per-phase — a deviation within run-to-run variance.

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
    kg_opt_state: Any
    ps_opt_state: Any
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


def make_srrl_optimizers(cfg: Config, params):
    kg_mask, ps_mask = _phase_masks(params)
    adam = optax.adam(cfg.train.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    tx_kg = optax.masked(adam, kg_mask)
    tx_ps = optax.masked(adam, ps_mask)
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
            updates, opt_state = tx_kg.update(grads, state.kg_opt_state,
                                              state.params)
            params = optax.apply_updates(state.params, updates)
            return dataclasses.replace(state, params=params,
                                       kg_opt_state=opt_state,
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
        updates, opt_state = tx_ps.update(grads, state.ps_opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return dataclasses.replace(state, params=params, ps_opt_state=opt_state,
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
    state = SrrlTrainState(params=params, kg_opt_state=tx_kg.init(params),
                           ps_opt_state=tx_ps.init(params),
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
