from ihgnn_tpu.models.embedding import EmbeddingTables
from ihgnn_tpu.models.interaction import FeatureInteractor
from ihgnn_tpu.models.layers import GATLayer, GCNLayer, HGCNLayer, IHGNNLayer
from ihgnn_tpu.models.prediction import HemPredictionLayer
from ihgnn_tpu.models.rawgnn import RawGnn
from ihgnn_tpu.models.srrl import Srrl

__all__ = [
    "EmbeddingTables",
    "FeatureInteractor",
    "GCNLayer",
    "GATLayer",
    "HGCNLayer",
    "IHGNNLayer",
    "HemPredictionLayer",
    "RawGnn",
    "Srrl",
]
