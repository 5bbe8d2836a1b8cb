"""Experiment driver — the ``python -m ihgnn_tpu.cli`` entry point.

Replaces the reference's Main.py: dataset + model construction, optional
checkpoint resume, the epoch loop with test/store scheduling, best-epoch
selection by validation NDCG@10, and the metrics/long-tail result files
(Main.py:20-327). All heavy work happens inside the jitted train/eval
functions; this file is glue.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from ihgnn_tpu.config import Config, V, parse_args
from ihgnn_tpu.data.dataset import (EvalLogs, GraphData, TrainSampler,
                                    prefetch)
from ihgnn_tpu.models.rawgnn import RawGnn
from ihgnn_tpu.parallel.mesh import make_mesh
from ihgnn_tpu.parallel.sharding import (pad_graph2d_for_mesh,
                                         pad_hypergraph_for_mesh, shard_batch,
                                         shard_graph, shard_state)
from ihgnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from ihgnn_tpu.train.controller import EpochSchedule
from ihgnn_tpu.train.eval import evaluate, make_eval_fns
from ihgnn_tpu.train.metrics import Metrics, MetricsCollection
from ihgnn_tpu.train.train import (adjust_lr_after_epoch, init_state,
                                   make_optimizer, make_train_step)
from ihgnn_tpu.utils.logging import end_logging, log_print, start_logging


def result_dir_name(cfg: Config) -> str:
    """Result directory naming convention (Main.py:80-88):
    <dataset parts>-<Model>[-<L><Layer>][-O<order>]-emb<size>."""
    parts = [p for p in cfg.io.data_dir.strip("/").split("/") if p][-2:]
    model_names = {V.RAWGNN: "RawGnn", V.SRRL: "Srrl"}
    layer_names = {V.GCN: "GCNLayer", V.GAT: "GATLayer",
                   V.HGCN: "HGCNLayer", V.IHGNN: "IHGNNLayer"}
    parts.append(model_names[cfg.model.model])
    if cfg.model.model == V.RAWGNN:
        parts.append(f"{cfg.model.gnn_layer_count}{layer_names[cfg.model.gnn]}")
        if cfg.model.gnn == V.IHGNN:
            parts.append(f"O{cfg.model.feature_interaction_order}")
    parts.append(f"emb{cfg.model.embedding_size}")
    return os.path.join(cfg.io.result_dir, "-".join(parts))


def pick_graph(data: GraphData, cfg: Config):
    if cfg.model.gnn in (V.GCN, V.GAT):
        return data.graph2d
    if cfg.model.use_log_hypergraph:
        if cfg.model.gnn != V.HGCN:
            raise ValueError("--log_hypergraph requires --gnn hgcn "
                             "(ragged edges have no fixed-order interaction)")
        return data.log_hypergraph
    return data.hypergraph


def run(cfg: Config) -> MetricsCollection:
    t = cfg.train

    if cfg.runtime.multihost:
        # multi-host runtime: every process joins the global mesh; the
        # coordinator address comes from the TPU env (or JAX_COORDINATOR_*)
        jax.distributed.initialize()

    result_dir = result_dir_name(cfg)
    os.makedirs(result_dir, exist_ok=True)
    stamp = time.strftime("%y%m%d-%H%M%S", time.localtime())
    fn_log = f"{stamp}_train_log.txt" if cfg.io.store_metrics else "train_log.txt"
    fn_metrics = f"{stamp}_metrics.txt"
    start_logging(os.path.join(result_dir, fn_log))

    log_print(f"devices: {jax.devices()}")
    log_print(f"mesh: data={cfg.mesh.data} model={cfg.mesh.model}")
    log_print(f"batch size: {t.batch_size} | lr: {t.learning_rate} | "
              f"emb: {cfg.model.embedding_size} | wd: {t.weight_decay}")
    log_print(f"neg sampling rand/nonrand: {t.random_negative_sample_size}/"
              f"{t.non_random_negative_sample_size}")
    log_print(f"model: {cfg.model.model} | gnn: {cfg.model.gnn} x "
              f"{cfg.model.gnn_layer_count} | order: "
              f"{cfg.model.feature_interaction_order} | dataset: {cfg.io.data_dir}")

    # ---- data ----
    # dataset-root indirection: a ./dataset_dir.txt first line prefixes
    # relative dataset paths (Main.py:73-77)
    data_dir = cfg.io.data_dir
    if not os.path.isabs(data_dir) and os.path.exists("./dataset_dir.txt"):
        with open("./dataset_dir.txt", "r", encoding="utf-8") as f:
            root = f.readline().strip()
        if root and not os.path.exists(data_dir):
            data_dir = os.path.join(root, data_dir)
            log_print(f"dataset root indirection: {data_dir}")
    cfg = dataclasses_replace_io(cfg, data_dir)

    log_print("loading dataset...")
    data = GraphData.from_files(cfg.io.data_dir, "train",
                                graph_completeness=cfg.model.graph_completeness,
                                user_history_limit=cfg.runtime.user_history_limit)
    valid = EvalLogs.from_file(os.path.join(cfg.io.data_dir, "valid_data.csv"))
    test = EvalLogs.from_file(os.path.join(cfg.io.data_dir, "test_data.csv"))
    log_print(f"users {data.user_count} queries {data.query_count} items "
              f"{data.item_count} vocab {data.vocab_size} logs "
              f"{len(data.search_logs)} positives {data.pos_count}")
    log_print(f"valid logs {valid.count}/{valid.line_count}; "
              f"test logs {test.count}/{test.line_count}")

    # ---- mesh + model ----
    mesh = make_mesh(cfg.mesh) if cfg.mesh.device_count > 1 else None
    graph = pick_graph(data, cfg)
    if not cfg.runtime.use_pallas:
        from ihgnn_tpu.ops.hyperagg import strip_kernel_packing
        graph = strip_kernel_packing(graph)
        log_print("pallas kernels disabled (--no_pallas): XLA fallback ops")
    if mesh is not None:
        bag_inputs = (data.query_words, data.query_word_counts,
                      data.vocab_size + 1)
        if cfg.model.uses_hypergraph and not cfg.model.use_log_hypergraph:
            # pack_kernels None = auto (TPU only); False under --no_pallas
            graph = pad_hypergraph_for_mesh(
                graph, cfg.mesh.data, mesh=mesh,
                pack_kernels=None if cfg.runtime.use_pallas else False,
                bag_inputs=bag_inputs)
        elif cfg.model.gnn in (V.GCN, V.GAT):
            graph = pad_graph2d_for_mesh(
                graph, cfg.mesh.data, mesh=mesh,
                pack_kernels=None if cfg.runtime.use_pallas else False,
                bag_inputs=bag_inputs)

    if cfg.model.model == V.RAWGNN:
        model = RawGnn(cfg=cfg.model, user_count=data.user_count,
                       query_count=data.query_count, item_count=data.item_count,
                       vocab_size=data.vocab_size,
                       table_row_multiple=max(cfg.mesh.model, 1))
    elif cfg.model.model == V.SRRL:
        from ihgnn_tpu.train.srrl_loop import run_srrl
        return run_srrl(cfg, data, valid, test, result_dir, fn_metrics)
    else:
        raise ValueError(cfg.model.model)

    tx = make_optimizer(cfg)
    rng = jax.random.key(t.seed)
    state = init_state(model, rng, graph, data.query_words,
                       data.query_word_counts, cfg, tx)

    log_params(state.params)

    # ---- checkpoint resume (Main.py:195-214) ----
    epoch_start = 1
    if cfg.io.checkpoint:
        epoch_ckpt, state = restore_checkpoint(result_dir, cfg.io.checkpoint, state)
        epoch_start = epoch_ckpt + 1
        log_print(f"restored checkpoint at epoch {epoch_ckpt}")

    row_multiple = cfg.mesh.data if mesh is not None else 1
    sampler = TrainSampler(data, t.batch_size, t.random_negative_sample_size,
                           t.non_random_negative_sample_size, seed=t.seed,
                           row_multiple=row_multiple)

    if mesh is not None:
        state = shard_state(state, mesh)
        graph = shard_graph(graph, mesh)

    # bind AFTER sharding so the step sees the sharded graph buffers
    train_step = make_train_step(model, graph, data.query_words,
                                 data.query_word_counts, tx,
                                 grad_accum_steps=t.grad_accum_steps)
    features_fn, metrics_fn = make_eval_fns(model, graph, data.query_words,
                                            data.query_word_counts)

    # ---- epoch loop (Main.py:238-290) ----
    schedule = EpochSchedule(
        t.epoch_count, epoch_start, t.epoch_start_test, t.epoch_test_frequency,
        t.epoch_count if cfg.io.store_checkpoint else None,
        1000000 if cfg.io.store_checkpoint else None)
    all_metrics = MetricsCollection(t.use_valid_dataset)
    log_print(f"training: epochs {t.epoch_count} | test from "
              f"{t.epoch_start_test} every {t.epoch_test_frequency}")

    for epoch in schedule.epochs:
        t0 = time.time()
        # profile the second epoch (first is compile-dominated)
        profiling = (cfg.runtime.profile_dir is not None
                     and epoch == epoch_start + 1)
        if profiling:
            jax.profiler.start_trace(cfg.runtime.profile_dir)
        losses = []
        for batch in prefetch(batched_epoch(sampler, t.grad_accum_steps)):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, loss = train_step(state, batch)
            losses.append(loss)
        if t.grad_accum_steps > 1:
            # accum steps return per-group loss sums
            avg_loss = float(sum(float(l) for l in losses)) / sampler.steps_per_epoch
        else:
            avg_loss = float(np.mean([float(l) for l in losses]))
        if profiling:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            log_print(f"profiler trace written to {cfg.runtime.profile_dir}")
        dt = time.time() - t0
        schedule.record_train_seconds(dt)
        log_print(f"[Epoch {epoch}/{schedule.last_epoch}] avg loss {avg_loss:.4f} "
                  f"on {data.pos_count} positives in {dt:.2f}s "
                  f"(remaining {schedule.remaining_text(epoch)})")

        state, changed = adjust_lr_after_epoch(state, avg_loss, cfg)
        if changed:
            log_print(f"learning rate adjusted to {float(state.lr):.6f}")

        if cfg.runtime.debug_stats:
            from ihgnn_tpu.utils import debug
            ue, ve, ie = debug.embedding_info(state.params)
            log_print(f"[debug] embedding absmean user={ue:.6f} "
                      f"vocab={ve:.6f} item={ie:.6f}")
            for s in debug.feature_stats_from(features_fn(state.params),
                                              cfg.model.embedding_size,
                                              cfg.model.gnn_layer_count):
                log_print(f"[debug] layer {s['layer']}: "
                          f"absmean={s['absmean']:.6f} std={s['std']:.6f}")

        if schedule.is_store_epoch(epoch):
            if jax.process_count() > 1:
                # device_get cannot fetch non-addressable (model-sharded)
                # table shards; gather the full state on every process and
                # let process 0 write it
                from jax.experimental import multihost_utils
                host_state = multihost_utils.process_allgather(state)
                if jax.process_index() == 0:
                    name = save_checkpoint(result_dir, epoch, host_state)
                    log_print(f"checkpoint saved: {name}")
            else:
                name = save_checkpoint(result_dir, epoch,
                                       jax.device_get(state))
                log_print(f"checkpoint saved: {name}")

        if schedule.is_test_epoch(epoch):
            collect = bool(cfg.io.long_tail_filename)
            feats = features_fn(state.params)
            m_t, rows, time_t = evaluate(state.params, features_fn, metrics_fn,
                                         test, t.eval_batch_size,
                                         collect_rows=collect, features=feats)
            log_print(f"test done in {time_t:.2f}s over {test.count} logs")
            log_print(m_t.to_string(), put_time_in_single_line=True)

            if collect:
                write_long_tail(os.path.join(result_dir, cfg.io.long_tail_filename),
                                data, test, rows)

            if t.use_valid_dataset:
                m_v, _, time_v = evaluate(state.params, features_fn, metrics_fn,
                                          valid, t.eval_batch_size, features=feats)
                log_print(f"valid done in {time_v:.2f}s")
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

    report_best(cfg, all_metrics, result_dir, fn_metrics)
    end_logging()
    return all_metrics


def dataclasses_replace_io(cfg: Config, data_dir: str) -> Config:
    import dataclasses
    return dataclasses.replace(cfg, io=dataclasses.replace(cfg.io,
                                                           data_dir=data_dir))


def batched_epoch(sampler: TrainSampler, grad_accum_steps: int):
    """Yield batches, or [k, R]-stacked groups when accumulating; the final
    partial group is padded with zero-weight batches."""
    if grad_accum_steps == 1:
        yield from sampler.epoch()
        return
    group = []
    for batch in sampler.epoch():
        group.append(batch)
        if len(group) == grad_accum_steps:
            yield jax.tree.map(lambda *xs: np.stack(xs), *group)
            group = []
    if group:
        filler = jax.tree.map(np.zeros_like, group[0])
        group += [filler] * (grad_accum_steps - len(group))
        yield jax.tree.map(lambda *xs: np.stack(xs), *group)


def log_params(params) -> None:
    """Aligned parameter table with mean/std/absmean
    (Helpers/TrainTestHelper.py:12-34)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(leaf)
        total += arr.size
        rows.append((name, str(arr.shape), float(arr.mean()),
                     float(arr.std()), float(np.abs(arr).mean())))
    if not rows:
        return
    w_name = max(len(r[0]) for r in rows)
    w_size = max(len(r[1]) for r in rows)
    log_print(f"Model Parameters ({len(rows)}):")
    for name, size, mean, std, absmean in rows:
        log_print(f"{name:<{w_name}} | size={size:<{w_size}} "
                  f"| mean={mean:<8.3f} | std={std:<8.3f} "
                  f"| absmean={absmean:<8.3f}")
    log_print(f"total parameters: {total}")


def write_long_tail(path: str, data: GraphData, test: EvalLogs,
                    rows: np.ndarray) -> None:
    """Per-user averaged metrics CSV: user, history length, HR, NDCG, MAP
    (Main.py:269-277)."""
    _, item_history = data.user_history()
    sums = np.zeros((data.user_count, 4))
    counts = np.zeros(data.user_count, np.int64)
    for i, u in enumerate(test.users):
        sums[u] += rows[i]
        counts[u] += 1
    with open(path, "w", encoding="utf-8") as f:
        for u in range(data.user_count):
            hist = len(item_history[u])
            if counts[u] == 0:
                f.write(f"{u},{hist},,,\n")
            else:
                hr, ndcg, m_ap, _ = sums[u] / counts[u]
                f.write(f"{u},{hist},{hr:.4f},{ndcg:.4f},{m_ap:.4f}\n")


def report_best(cfg: Config, all_metrics: MetricsCollection, result_dir: str,
                fn_metrics: str) -> None:
    """Best-epoch selection by valid NDCG@10 + metrics file epilogue
    (Main.py:292-325)."""
    if not list(all_metrics.iter_epoch_test()):
        return
    if cfg.train.use_valid_dataset:
        best_epoch, best_test, best_valid = all_metrics.get_valid_best(
            key=lambda m: m.NDCG_at10)
        log_print(f"Best valid metrics at epoch {best_epoch}:")
        log_print(best_valid.to_string(), put_time_in_single_line=True)
        log_print("Corresponding test metrics:")
        log_print(best_test.to_string(), put_time_in_single_line=True)
    else:
        best_epoch, best_test = all_metrics.get_test_best(key=lambda m: m.NDCG_at10)
        best_valid = None
        log_print(f"Best test metrics at epoch {best_epoch}:")
        log_print(best_test.to_string(), put_time_in_single_line=True)

    if cfg.io.store_metrics:
        with open(os.path.join(result_dir, fn_metrics), "a", encoding="utf-8") as f:
            if best_valid is not None:
                f.write(f"\n\nBest valid metrics at epoch {best_epoch}:\n")
                f.write(best_valid.to_string())
                f.write("\nCorresponding test metrics:\n")
            else:
                f.write("\nBest test metrics:\n")
            f.write(best_test.to_string() + "\n")
            f.write(f"\n\nAll TEST metrics:\nEpoch {Metrics.title}\n")
            for e, m in all_metrics.iter_epoch_test():
                f.write(f"{e} {m.to_string(no_title=True)}\n")
            if cfg.train.use_valid_dataset:
                f.write(f"\n\nAll VALID metrics:\nEpoch {Metrics.title}\n")
                for e, _, m in all_metrics.iter_epoch_test_valid():
                    f.write(f"{e} {m.to_string(no_title=True)}\n")


def main(argv=None):
    cfg = parse_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
