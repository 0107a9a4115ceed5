from espnet_tpu.layers.embedding import (
    PositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
)
from espnet_tpu.layers.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from espnet_tpu.layers.feed_forward import (
    Conv1dLinear,
    MultiLayeredConv1d,
    PositionwiseFeedForward,
)
from espnet_tpu.layers.subsampling import Conv2dSubsampling
from espnet_tpu.layers.convolution import ConformerConvModule
from espnet_tpu.layers.lightconv import (
    DynamicConvolution,
    DynamicConvolution2D,
    LightweightConvolution,
    LightweightConvolution2D,
)
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
    "LightweightConvolution2D",
    "DynamicConvolution",
    "DynamicConvolution2D",
    "MultiLayeredConv1d",
    "Conv1dLinear",
    "ZoneOutLSTMCell",
    "CBHG",
]
