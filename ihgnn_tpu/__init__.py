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
