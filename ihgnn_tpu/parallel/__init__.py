from ihgnn_tpu.parallel.mesh import make_mesh
from ihgnn_tpu.parallel.sharding import (
    shard_batch,
    shard_graph,
    shard_state,
    state_sharding,
)

__all__ = ["make_mesh", "shard_batch", "shard_graph", "shard_state",
           "state_sharding"]
