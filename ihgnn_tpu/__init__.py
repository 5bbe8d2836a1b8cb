"""ihgnn_tpu: a TPU-native personalized product search framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of IHGNN
(Interactive Hypergraph Neural Network for Personalized Product Search,
WWW 2022; reference implementation: CDboyOne/IHGNN, PyTorch).

Layering (bottom-up):
  ops/        segment/scatter kernels (XLA + Pallas) used by all GNN layers
  graph       hypergraph / bipartite-graph packing into frozen sorted arrays
  data/       search-log schema, preprocessing pipeline, batch samplers
  models/     flax modules: embeddings, GNN layers, prediction heads, models
  train/      jitted train step, jitted full-catalog eval, metrics, loop
  parallel/   mesh construction and sharding rules (DP + row-sharded tables
              + hyperedge sharding)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports of the main entry points (keeps bare import light)
    if name in ("Config", "parse_args", "V"):
        from ihgnn_tpu import config
        return getattr(config, name)
    if name == "GraphData":
        from ihgnn_tpu.data.dataset import GraphData
        return GraphData
    if name == "RawGnn":
        from ihgnn_tpu.models.rawgnn import RawGnn
        return RawGnn
    if name == "Srrl":
        from ihgnn_tpu.models.srrl import Srrl
        return Srrl
    if name == "run":
        from ihgnn_tpu.cli import run
        return run
    raise AttributeError(name)
