from tacotron_tpu.ops.modules import (
    Prenet,
    HighwayStack,
    ConvBank,
    Conv1dProjection,
    BatchNorm,
)
from tacotron_tpu.ops.gru import GRUCell, unidirectional_gru, bidirectional_gru
from tacotron_tpu.ops.attention import BahdanauAttention
from tacotron_tpu.ops.cbhg import CBHG

__all__ = [
    "Prenet",
    "HighwayStack",
    "ConvBank",
    "Conv1dProjection",
    "BatchNorm",
    "GRUCell",
    "unidirectional_gru",
    "bidirectional_gru",
    "BahdanauAttention",
    "CBHG",
]
