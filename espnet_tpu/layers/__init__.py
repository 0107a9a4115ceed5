from espnet_tpu.layers.embedding import (
    PositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
)
from espnet_tpu.layers.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.layers.subsampling import Conv2dSubsampling
from espnet_tpu.layers.convolution import ConformerConvModule
from espnet_tpu.layers.lightconv import DynamicConvolution, LightweightConvolution
from espnet_tpu.layers.tacotron_extras import CBHG, ZoneOutLSTMCell

__all__ = [
    "PositionalEncoding",
    "ScaledPositionalEncoding",
    "RelPositionalEncoding",
    "MultiHeadedAttention",
    "RelPositionMultiHeadedAttention",
    "PositionwiseFeedForward",
    "Conv2dSubsampling",
    "ConformerConvModule",
    "LightweightConvolution",
    "DynamicConvolution",
    "ZoneOutLSTMCell",
    "CBHG",
]
