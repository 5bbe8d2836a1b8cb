from ihgnn_tpu.train.metrics import Metrics, MetricsCollection, ranking_metrics
from ihgnn_tpu.train.controller import ProcessController

__all__ = ["Metrics", "MetricsCollection", "ranking_metrics", "ProcessController"]
