"""Device mesh construction.

The scaling design (SURVEY.md §2.2, §5):

* axis ``data``  — shards the hyperedge/incidence arrays and the training
  batch. This is the long axis of the workload (one hyperedge per positive
  interaction; the stress config reaches 1e8 edges) — the hypergraph analog
  of sequence parallelism: each shard segment-sums its edge block and XLA
  combines node partials with psum/reduce-scatter collectives over ICI.
* axis ``model`` — row-shards the embedding tables (user/vocab/item).
  Endpoint gathers become all-to-all collectives inserted by GSPMD.

Single-chip is the degenerate 1x1 mesh — the same jitted program.
Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the global device list spans hosts (DCN at slice boundaries).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from ihgnn_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    need = cfg.data * cfg.model
    if len(devices) < need:
        raise ValueError(f"mesh {cfg.data}x{cfg.model} needs {need} devices, "
                         f"have {len(devices)}")
    import numpy as np
    grid = np.array(devices[:need]).reshape(cfg.data, cfg.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
