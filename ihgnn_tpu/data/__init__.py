from ihgnn_tpu.data.schema import (
    SearchLog,
    RawSearchLog,
    PosInteraction,
    CikmSearchLog,
)
from ihgnn_tpu.data.collections import SearchLogCollection, RawSearchLogCollection
from ihgnn_tpu.data.dataset import GraphData, TrainSampler, EvalLogs

__all__ = [
    "SearchLog",
    "RawSearchLog",
    "PosInteraction",
    "CikmSearchLog",
    "SearchLogCollection",
    "RawSearchLogCollection",
    "GraphData",
    "TrainSampler",
    "EvalLogs",
]
