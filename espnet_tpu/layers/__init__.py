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

__all__ = [
    "PositionalEncoding",
    "ScaledPositionalEncoding",
    "RelPositionalEncoding",
    "MultiHeadedAttention",
    "RelPositionMultiHeadedAttention",
    "PositionwiseFeedForward",
    "Conv2dSubsampling",
    "ConformerConvModule",
]
