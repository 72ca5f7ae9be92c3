from tacotron_tpu.models.encoder import Encoder
from tacotron_tpu.models.decoder import Decoder, DecoderState
from tacotron_tpu.models.postnet import PostNet
from tacotron_tpu.models.tacotron import Tacotron, TacotronOutput

__all__ = [
    "Encoder",
    "Decoder",
    "DecoderState",
    "PostNet",
    "Tacotron",
    "TacotronOutput",
]
