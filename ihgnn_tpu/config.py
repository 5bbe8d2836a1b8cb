"""Typed configuration for ihgnn_tpu.

Replaces the reference's two-tier config (mutable `Gs` static class +
argparse overrides, see /root/reference/Helpers/GlobalSettings.py and
/root/reference/Helpers/ArgsParser.py) with a single frozen dataclass tree.

Every knob of the reference CLI surface (SURVEY.md §7.4) is represented:
model / gnn / layer count / interaction order / phase-2 attention / graph
completeness / dataset path / epoch schedule / checkpointing / metrics file /
long-tail stats / embedding size / negative-sample sizes / query transform /
cosine-vs-dot prediction / Srrl knobs — plus new TPU-native knobs (mesh
shape, dtype, kernel backend).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple


# Enumerated string values (reference: Helpers/GlobalSettings.py:4-16 `Gsv`).
class V:
    MEAN = "mean"
    ACTIVATION = "activation"

    CONCAT = "concatenation"
    PRODUCT = "product"

    GRAPH_UQI = "uqi"
    GRAPH_ONLY_UQ = "uq"
    GRAPH_ONLY_UI = "ui"
    GRAPH_ONLY_QI = "qi"

    # Model names
    RAWGNN = "rawgnn"
    SRRL = "srrl"

    # GNN layer names
    GCN = "gcn"
    GAT = "gat"
    HGCN = "hgcn"
    IHGNN = "ihgnn"


GNN_LAYER_NAMES = (V.GCN, V.GAT, V.HGCN, V.IHGNN)
MODEL_NAMES = (V.RAWGNN, V.SRRL)
COMPLETENESS_VALUES = (V.GRAPH_UQI, V.GRAPH_ONLY_UQ, V.GRAPH_ONLY_UI, V.GRAPH_ONLY_QI)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model architecture knobs (reference defaults: Main.py:45-59)."""

    model: str = V.RAWGNN                 # rawgnn | srrl
    gnn: str = V.IHGNN                    # gcn | gat | hgcn | ihgnn
    gnn_layer_count: int = 2              # Main.py:55
    embedding_size: int = 32              # GlobalSettings.py:30
    feature_interaction_order: int = 3    # Main.py:56; layers >0 forced to 1
    phase2_attention: bool = False        # Main.py:57
    graph_completeness: str = V.GRAPH_UQI # ArgsParser.py:85 default
    lambda_muq: float = 0.5               # GlobalSettings.py:23
    use_cosine_similarity: bool = False   # GlobalSettings.py:78-81
    query_transform: str = V.MEAN         # GlobalSettings.py:68-76
    gat_head: str = V.CONCAT              # GlobalSettings.py:59-66
    # Srrl knobs (GlobalSettings.py:87-91)
    srrl_kg_loss: bool = True
    srrl_uni_weight: bool = False
    srrl_regularization: float = 0.0
    # one hyperedge per whole search log = {u, q, positive items} instead of
    # one per interaction (Helpers/Graph.py:138-189); HGCN only (ragged
    # edges have no fixed-order feature interaction)
    use_log_hypergraph: bool = False
    # rematerialize GNN layers in the backward pass: trades recompute for
    # peak memory (needed for the 100M-hyperedge stress configs)
    remat: bool = False
    # bf16 [d, E] conv streams (ops/hyperagg.py): halves HBM traffic of the
    # hot pipeline; accumulation stays f32, MXU operands were bf16 anyway
    bf16_stream: bool = False

    @property
    def output_feature_size(self) -> int:
        # concat of [X0, X1, ..., XL] (reference: Models/RawGnn.py:49)
        return self.embedding_size * (1 + self.gnn_layer_count)

    @property
    def uses_hypergraph(self) -> bool:
        return self.gnn in (V.HGCN, V.IHGNN)

    def layer_order(self, layer: int) -> int:
        """Interaction order for a given IHGNN layer (RawGnn.py:76-78)."""
        o = self.feature_interaction_order
        return 1 if (o > 1 and layer > 0) else o


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference: GlobalSettings.py:26-41, Main.py:27-31)."""

    batch_size: int = 100                 # positives per step
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    random_negative_sample_size: int = 10
    non_random_negative_sample_size: int = 0
    epoch_count: int = 110
    epoch_start_test: int = 10
    epoch_test_frequency: int = 10
    use_valid_dataset: bool = True
    # lr *= 0.98 whenever epoch avg loss < 0.008 while lr > 4e-4
    # (reference: Helpers/TrainTestHelper.py:155-159)
    adjust_learning_rate: bool = True
    lr_decay_factor: float = 0.98
    lr_decay_loss_threshold: float = 0.008
    lr_floor: float = 4e-4
    seed: int = 0
    # gradient accumulation over k batches per optimizer step
    # (the reference's Gs.batch_size_times, TrainTestHelper.py:137-143)
    grad_accum_steps: int = 1
    # eval batching (new; reference scores one log at a time)
    eval_batch_size: int = 256

    @property
    def negative_sample_size(self) -> int:
        return self.random_negative_sample_size + self.non_random_negative_sample_size


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh shape: data axis shards batch + hyperedges, model axis
    row-shards embedding tables. (1, 1) degenerates to single chip."""

    data: int = 1
    model: int = 1

    @property
    def device_count(self) -> int:
        return self.data * self.model


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    dtype: str = "float32"           # compute dtype for features
    param_dtype: str = "float32"
    # Pallas fused hyperedge kernels; when False the CLI strips the pk_*
    # packing from the graph so every op takes the XLA fallback path
    use_pallas: bool = True
    user_history_limit: int = 500    # GlobalSettings.py:93-96
    profile_dir: Optional[str] = None
    multihost: bool = False          # jax.distributed.initialize() at start
    # per-epoch embedding/layer statistics (Gs.Debug
    # show_highorder_embedding_info, GlobalSettings.py:98-108)
    debug_stats: bool = False


@dataclasses.dataclass(frozen=True)
class IOConfig:
    data_dir: str = ""               # directory with graph_info.txt etc.
    result_dir: str = "Results"
    checkpoint: str = ""             # '' | 'latest' | explicit name
    store_checkpoint: bool = False
    store_metrics: bool = False
    long_tail_filename: str = ""


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    io: IOConfig = dataclasses.field(default_factory=IOConfig)

    def validate(self) -> "Config":
        m, t = self.model, self.train
        if m.model not in MODEL_NAMES:
            raise ValueError(f"unknown model {m.model!r}; expected one of {MODEL_NAMES}")
        if m.gnn not in GNN_LAYER_NAMES:
            raise ValueError(f"unknown gnn {m.gnn!r}; expected one of {GNN_LAYER_NAMES}")
        if m.feature_interaction_order not in (1, 2, 3):
            raise ValueError("feature_interaction_order must be 1, 2 or 3")
        if m.graph_completeness not in COMPLETENESS_VALUES:
            raise ValueError(f"graph_completeness must be one of {COMPLETENESS_VALUES}")
        if m.gnn_layer_count < 0:
            raise ValueError("gnn_layer_count must be >= 0")
        if t.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        return self


def _canon_model(name: str) -> str:
    return name.strip().lower()


def _canon_gnn(name: str) -> str:
    n = name.strip().lower()
    if n.endswith("layer"):
        n = n[: -len("layer")]
    return n


def parse_args(argv=None) -> Config:
    """CLI with the reference's flag surface (Helpers/ArgsParser.py:52-95)
    plus TPU-native additions."""
    p = argparse.ArgumentParser(prog="ihgnn-tpu")
    p.add_argument("--checkpoint", "--cp", default="", type=str,
                   help="checkpoint name to load, or 'latest', or '' for none")
    p.add_argument("--storecheckpoint", "--scp", "-c", action="store_true", default=False)
    p.add_argument("--storemetrics", "--sm", "-m", action="store_true", default=False)
    p.add_argument("--epoch_count", "--ec", type=int, default=0)
    p.add_argument("--epoch_start_test", "--est", type=int, default=0)
    p.add_argument("--epoch_test_frequency", "--etf", type=int, default=0)
    p.add_argument("--dataset", "--ds", type=str, default="",
                   help="directory containing graph_info.txt / *_data.csv")
    p.add_argument("--model", type=str, default="")
    p.add_argument("--gnn", type=str, default="")
    p.add_argument("--gnns", type=int, default=0)
    p.add_argument("--feature_order", "--fo", type=int, default=0)
    p.add_argument("--phase2_attention", action="store_true", default=False)
    p.add_argument("--completeness", type=str, default=V.GRAPH_UQI)
    p.add_argument("--longtail", type=str, default="")
    p.add_argument("--embedding_size", "--emb", type=int, default=0)
    p.add_argument("--batch_size", "--bs", type=int, default=0)
    p.add_argument("--learning_rate", "--lr", type=float, default=0.0)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--neg_random", type=int, default=-1)
    p.add_argument("--neg_nonrandom", type=int, default=-1)
    p.add_argument("--epochs", type=int, default=0, help="alias of --epoch_count")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--result_dir", type=str, default="Results")
    # TPU-native knobs
    p.add_argument("--log_hypergraph", action="store_true", default=False,
                   help="one hyperedge per search log (HGCN only)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize GNN layers in backward (saves memory)")
    p.add_argument("--bf16_stream", action="store_true", default=False,
                   help="bf16 hyperedge streams (half HBM traffic, f32 accum)")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--multihost", action="store_true", default=False,
                   help="call jax.distributed.initialize() at startup")
    p.add_argument("--no_pallas", action="store_true", default=False)
    p.add_argument("--debug_stats", action="store_true", default=False,
                   help="print per-epoch embedding/layer statistics "
                        "(Gs.Debug equivalent)")
    p.add_argument("--no_valid", action="store_true", default=False)
    p.add_argument("--eval_batch_size", type=int, default=256)
    p.add_argument("--profile_dir", type=str, default="")
    a = p.parse_args(argv)

    base = Config()
    model = dataclasses.replace(
        base.model,
        model=_canon_model(a.model) or base.model.model,
        gnn=_canon_gnn(a.gnn) or base.model.gnn,
        gnn_layer_count=a.gnns or base.model.gnn_layer_count,
        embedding_size=a.embedding_size or base.model.embedding_size,
        feature_interaction_order=a.feature_order or base.model.feature_interaction_order,
        phase2_attention=a.phase2_attention,
        graph_completeness=a.completeness,
        use_log_hypergraph=a.log_hypergraph,
        remat=a.remat,
        bf16_stream=a.bf16_stream,
    )
    train = dataclasses.replace(
        base.train,
        batch_size=a.batch_size or base.train.batch_size,
        learning_rate=a.learning_rate or base.train.learning_rate,
        epoch_count=a.epoch_count or a.epochs or base.train.epoch_count,
        epoch_start_test=a.epoch_start_test or base.train.epoch_start_test,
        epoch_test_frequency=(a.epoch_test_frequency or a.epoch_start_test
                              or base.train.epoch_test_frequency),
        random_negative_sample_size=(a.neg_random if a.neg_random >= 0
                                     else base.train.random_negative_sample_size),
        non_random_negative_sample_size=(a.neg_nonrandom if a.neg_nonrandom >= 0
                                         else base.train.non_random_negative_sample_size),
        use_valid_dataset=not a.no_valid,
        seed=a.seed,
        grad_accum_steps=max(a.grad_accum, 1),
        eval_batch_size=a.eval_batch_size,
    )
    mesh = MeshConfig(data=a.mesh_data, model=a.mesh_model)
    runtime = dataclasses.replace(
        base.runtime,
        use_pallas=not a.no_pallas,
        profile_dir=a.profile_dir or None,
        multihost=a.multihost,
        debug_stats=a.debug_stats,
    )
    io = IOConfig(
        data_dir=a.dataset,
        result_dir=a.result_dir,
        checkpoint=a.checkpoint,
        store_checkpoint=a.storecheckpoint,
        store_metrics=a.storemetrics,
        long_tail_filename=a.longtail,
    )
    return Config(model=model, train=train, mesh=mesh, runtime=runtime, io=io).validate()
