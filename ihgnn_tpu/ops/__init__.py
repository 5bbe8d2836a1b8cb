from ihgnn_tpu.ops.segment import (
    segment_sum,
    segment_softmax,
    hyperedge_gather,
    hyperedge_scatter,
    spmm,
)

__all__ = [
    "segment_sum",
    "segment_softmax",
    "hyperedge_gather",
    "hyperedge_scatter",
    "spmm",
]
