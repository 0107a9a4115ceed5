"""Transformer encoder (reference: transformer/encoder.py:48).

Pre-norm residual blocks of MHSA + position-wise FF, preceded by conv2d
×4/×6/×8 subsampling (or a linear input layer). Everything static-shape;
valid lengths flow alongside as `olens` and masking is boolean.
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.layers.attention import MultiHeadedAttention
from espnet_tpu.layers.embedding import PositionalEncoding
from espnet_tpu.layers.feed_forward import positionwise_layer_for
from espnet_tpu.layers.lightconv import conv_attention_for
from espnet_tpu.layers.subsampling import Conv2dSubsampling
from espnet_tpu.utils.masks import make_non_pad_mask


class TransformerEncoderLayer(nn.Module):
    attention_dim: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    # selfattn | lightconv | lightconv2d | dynamicconv | dynamicconv2d
    # (reference e2e_asr_transformer.py --transformer-encoder-selfattn-layer-type)
    selfattn_layer_type: str = "selfattn"
    conv_wshare: int = 4
    conv_kernel_size: int = 15
    conv_usebias: bool = False
    positionwise_layer_type: str = "linear"  # linear | conv1d | conv1d-linear
    positionwise_conv_kernel_size: int = 3
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        if self.selfattn_layer_type == "selfattn":
            attn = MultiHeadedAttention(
                self.attention_heads, self.attention_dim,
                self.attention_dropout_rate, dtype=self.dtype,
            )
        else:
            attn = conv_attention_for(
                self.selfattn_layer_type,
                wshare=self.conv_wshare,
                kernel_size=self.conv_kernel_size,
                dropout_rate=self.attention_dropout_rate,
                use_bias=self.conv_usebias,
                dtype=self.dtype,
            )
        x = attn(x, x, x, mask, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        x = positionwise_layer_for(
            self.positionwise_layer_type,
            self.linear_units,
            self.dropout_rate,
            kernel_size=self.positionwise_conv_kernel_size,
            dtype=self.dtype,
        )(x, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        return x


class TransformerEncoder(nn.Module):
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"  # conv2d | conv2d6 | conv2d8 | linear | embed
    normalize_before: bool = True
    vocab_size: int = 0  # required for input_layer == "embed"
    selfattn_layer_type: str = "selfattn"
    conv_wshare: int = 4
    # int or per-layer "11_13_15" string (reference --ldconv-encoder-kernel-length)
    conv_kernel_length: object = None
    conv_usebias: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 3
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        deterministic: bool = True,
    ):
        """(B, T, D) features → (B, T', adim) encoded, with new lengths."""
        if self.input_layer in ("conv2d", "conv2d6", "conv2d8"):
            factor = {"conv2d": 4, "conv2d6": 6, "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(
                self.attention_dim, factor, dtype=self.dtype
            )(xs.astype(self.dtype), ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.attention_dim)(xs)
            xs = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
            xs = nn.relu(xs)
            olens = ilens
        elif self.input_layer == "embed":
            if self.vocab_size <= 0:
                raise ValueError("vocab_size required for embed input layer")
            xs = nn.Embed(self.vocab_size, self.attention_dim)(xs)
            olens = ilens
        else:
            raise ValueError(self.input_layer)
        xs = PositionalEncoding(self.attention_dim, self.positional_dropout_rate)(
            xs, deterministic=deterministic
        )
        mask = make_non_pad_mask(olens, xs.shape[1])[:, None, :]  # (B,1,T)
        from espnet_tpu.layers.lightconv import parse_kernel_length

        for lnum in range(self.num_blocks):
            xs = TransformerEncoderLayer(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                self.attention_dropout_rate,
                self.normalize_before,
                selfattn_layer_type=self.selfattn_layer_type,
                conv_wshare=self.conv_wshare,
                conv_kernel_size=parse_kernel_length(
                    self.conv_kernel_length, lnum
                ),
                conv_usebias=self.conv_usebias,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                dtype=self.dtype,
            )(xs, mask, deterministic=deterministic)
        if self.normalize_before:
            xs = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(xs)
        return xs.astype(jnp.float32), olens


class ScannedTransformerEncoder(nn.Module):
    """TransformerEncoder with the block stack as a jax.lax.scan over ONE
    layer's stacked params — compiled program (and serialized HLO)
    constant in depth (round-5 remote-compile-payload finding; same
    mechanism as ScannedTransformerDecoder / ScannedTransformerLM).
    Uniform selfattn blocks only — a scan body must be layer-invariant.
    Reference surface: transformer/encoder.py:48."""

    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"  # conv2d | conv2d6 | conv2d8 | linear | embed
    normalize_before: bool = True
    vocab_size: int = 0
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 3
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        deterministic: bool = True,
    ):
        if self.input_layer in ("conv2d", "conv2d6", "conv2d8"):
            factor = {"conv2d": 4, "conv2d6": 6, "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(
                self.attention_dim, factor, dtype=self.dtype
            )(xs.astype(self.dtype), ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.attention_dim)(xs)
            xs = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
            xs = nn.relu(xs)
            olens = ilens
        elif self.input_layer == "embed":
            if self.vocab_size <= 0:
                raise ValueError("vocab_size required for embed input layer")
            xs = nn.Embed(self.vocab_size, self.attention_dim)(xs)
            olens = ilens
        else:
            raise ValueError(self.input_layer)
        xs = PositionalEncoding(self.attention_dim, self.positional_dropout_rate)(
            xs, deterministic=deterministic
        )
        mask = make_non_pad_mask(olens, xs.shape[1])[:, None, :]

        layer = TransformerEncoderLayer(
            self.attention_dim,
            self.attention_heads,
            self.linear_units,
            self.dropout_rate,
            self.attention_dropout_rate,
            self.normalize_before,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            dtype=self.dtype,
        )

        def body(blk, carry, _):
            x, m = carry
            return (blk(x, m, deterministic=deterministic), m), None

        (xs, _), _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
        )(layer, (xs, mask), None)
        if self.normalize_before:
            xs = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(xs)
        return xs.astype(jnp.float32), olens
