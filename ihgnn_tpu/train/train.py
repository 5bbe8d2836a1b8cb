"""Jitted training step and train state.

The step is one pure function: full-graph forward (the reference's per-step
semantics, SURVEY.md §3.1), pointwise BCE-with-logits over the padded
positive+negative rows (Main.py:191, TrainTestHelper.py:126-134), Adam with
torch-style (coupled) weight decay, and a *dynamic* learning rate passed as
an argument — the reference's host-side LR decay (×0.98 when the epoch's
average loss dips below 0.008 while lr > 4e-4, TrainTestHelper.py:155-159)
changes lr between epochs without recompiling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ihgnn_tpu.config import Config


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray    # int32 scalar
    lr: jnp.ndarray      # f32 scalar (dynamic, host-adjusted between epochs)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam moments only; the learning-rate scale is applied in the step so
    lr can change without recompilation. torch Adam's weight_decay couples
    decay into the gradient *before* the moments — replicated here."""
    parts = []
    if cfg.train.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.train.weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted mean sigmoid BCE (padding rows carry weight 0)."""
    per_row = optax.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.sum(per_row * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def make_train_step(model, graph, query_words, query_word_counts,
                    tx: optax.GradientTransformation,
                    grad_accum_steps: int = 1) -> Callable:
    """Returns train_step(state, batch) -> (state, loss).

    The graph/query arrays enter the jitted step as *arguments* (bound via
    jax.tree_util.Partial-style closure below but passed through the traced
    call), so they are runtime buffers rather than baked HLO literals —
    large-graph programs otherwise exceed compile-payload limits.

    ``grad_accum_steps`` > 1 replicates the reference's ``batch_size_times``
    (TrainTestHelper.py:137-143): the step takes a stacked batch pytree of
    [k, R] leaves, sums gradients over the k microbatches (torch
    ``backward`` accumulation semantics) and applies one optimizer update;
    the returned loss is the sum over microbatches (caller averages).

    The returned function is ALREADY jitted (with the train state donated);
    do not wrap it in jax.jit again — that would re-trace the binding
    wrapper and bake the graph back into the program as literals."""
    inner = jax.jit(make_graph_train_step(model, tx, grad_accum_steps),
                    donate_argnums=(0,))
    graph = jax.tree.map(jnp.asarray, graph)
    query_words = jnp.asarray(query_words)
    query_word_counts = jnp.asarray(query_word_counts)

    def train_step(state: TrainState, batch):
        return inner(state, graph, query_words, query_word_counts, batch)

    # exposed for harnesses that need the compiled module (bench_scaling
    # parses the optimized HLO for collective stats — utils/hlo_stats.py)
    train_step.inner = inner
    train_step.bound_args = (graph, query_words, query_word_counts)
    return train_step


def make_graph_train_step(model, tx: optax.GradientTransformation,
                          grad_accum_steps: int = 1) -> Callable:
    """train_step(state, graph, query_words, query_word_counts, batch)
    with the graph as an explicit traced argument."""

    def loss_fn(params, graph, query_words, query_word_counts, batch):
        logits = model.apply(params, graph, query_words, query_word_counts,
                             batch.users, batch.queries, batch.items)
        return bce_with_logits(logits, batch.flags, batch.weight)

    def apply_update(state, grads, loss):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -state.lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return dataclasses.replace(state, params=params, opt_state=opt_state,
                                   step=state.step + 1), loss

    if grad_accum_steps == 1:
        def train_step(state: TrainState, graph, query_words,
                       query_word_counts, batch) -> Tuple[TrainState, jnp.ndarray]:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, graph, query_words, query_word_counts, batch)
            return apply_update(state, grads, loss)
        return train_step

    def train_step(state: TrainState, graph, query_words, query_word_counts,
                   stacked) -> Tuple[TrainState, jnp.ndarray]:
        def body(carry, microbatch):
            gsum, lsum = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, graph, query_words, query_word_counts, microbatch)
            return (jax.tree.map(jnp.add, gsum, grads), lsum + loss), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum), _ = jax.lax.scan(body, (zero, jnp.zeros(())), stacked)
        return apply_update(state, grads, loss_sum)

    return train_step


def init_state(model, rng, graph, query_words, query_word_counts,
               cfg: Config, tx: optax.GradientTransformation) -> TrainState:
    users = jnp.zeros((1,), jnp.int32)
    queries = jnp.zeros((1,), jnp.int32)
    items = jnp.zeros((1,), jnp.int32)
    # jit the init: eager tracing dispatches each op separately, which is
    # prohibitively slow over a remote-TPU transport
    params = jax.jit(model.init)(rng, graph, query_words, query_word_counts,
                                 users, queries, items)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        lr=jnp.asarray(cfg.train.learning_rate, jnp.float32),
    )


def adjust_lr_after_epoch(state: TrainState, avg_loss: float, cfg: Config,
                          is_rawgnn: bool = True) -> Tuple[TrainState, bool]:
    """Host-side epoch-level LR decay (TrainTestHelper.py:155-159)."""
    t = cfg.train
    if (t.adjust_learning_rate and is_rawgnn
            and avg_loss < t.lr_decay_loss_threshold
            and float(state.lr) > t.lr_floor):
        new_lr = float(state.lr) * t.lr_decay_factor
        return dataclasses.replace(state, lr=jnp.asarray(new_lr, jnp.float32)), True
    return state, False
