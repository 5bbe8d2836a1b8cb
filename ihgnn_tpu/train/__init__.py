from ihgnn_tpu.train.metrics import Metrics, MetricsCollection, ranking_metrics
from ihgnn_tpu.train.controller import EpochSchedule

__all__ = ["Metrics", "MetricsCollection", "ranking_metrics", "EpochSchedule"]
