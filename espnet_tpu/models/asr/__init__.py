from espnet_tpu.models.asr.transformer_encoder import (
    ScannedTransformerEncoder,
    TransformerEncoder,
)
from espnet_tpu.models.asr.conformer_encoder import ConformerEncoder
from espnet_tpu.models.asr.transformer_decoder import (
    ScannedTransformerDecoder,
    TransformerDecoder,
)
from espnet_tpu.models.asr.rnn_encoder import RNNEncoder, VGG2L
from espnet_tpu.models.asr.rnn_decoder import RNNDecoder
from espnet_tpu.models.asr.ctc import CTCHead
from espnet_tpu.models.asr.espnet_model import ASRModel

__all__ = [
    "TransformerEncoder",
    "ScannedTransformerEncoder",
    "ConformerEncoder",
    "TransformerDecoder",
    "ScannedTransformerDecoder",
    "RNNEncoder",
    "VGG2L",
    "RNNDecoder",
    "CTCHead",
    "ASRModel",
]
