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
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.layers.subsampling import Conv2dSubsampling
from espnet_tpu.utils.masks import make_non_pad_mask


class TransformerEncoderLayer(nn.Module):
    attention_dim: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        x = MultiHeadedAttention(
            self.attention_heads, self.attention_dim, self.attention_dropout_rate,
            dtype=self.dtype,
        )(x, x, x, mask, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype)(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        x = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype
        )(x, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype)(x)
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
            xs = nn.LayerNorm(dtype=self.dtype)(xs)
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
        for _ in range(self.num_blocks):
            xs = TransformerEncoderLayer(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                self.attention_dropout_rate,
                self.normalize_before,
                dtype=self.dtype,
            )(xs, mask, deterministic=deterministic)
        if self.normalize_before:
            xs = nn.LayerNorm(dtype=self.dtype)(xs)
        return xs.astype(jnp.float32), olens
