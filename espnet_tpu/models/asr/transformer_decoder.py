"""Transformer decoder (reference: transformer/decoder.py:47).

Pre-norm blocks of causal self-attention + source attention + FF, token
embedding with sinusoidal positions, final LayerNorm + output projection.

`__call__` is the teacher-forced training path. `score_prefix` is the
beam-search path: it re-runs the full (static-length) prefix with a causal
mask and returns the log-probs at a given position — the TPU-friendly
formulation (one big batched matmul per step, no dynamic KV surgery);
a KV-cached variant can be swapped in later without changing callers.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.layers.attention import MultiHeadedAttention
from espnet_tpu.layers.embedding import PositionalEncoding
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class TransformerDecoderLayer(nn.Module):
    attention_dim: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, self_mask, memory, memory_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm()(x)
        x = MultiHeadedAttention(
            self.attention_heads, self.attention_dim, self.self_attention_dropout_rate,
            dtype=self.dtype,
        )(x, x, x, self_mask, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm()(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm()(x)
        x = MultiHeadedAttention(
            self.attention_heads, self.attention_dim, self.src_attention_dropout_rate,
            dtype=self.dtype,
        )(x, memory.astype(self.dtype), memory.astype(self.dtype), memory_mask, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm()(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm()(x)
        x = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype
        )(x, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm()(x)
        return x


class TransformerDecoder(nn.Module):
    vocab_size: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    causal: bool = True  # False = CMLM-style bidirectional (Mask-CTC)
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,
        memory_lens: jnp.ndarray,
        ys_in: jnp.ndarray,
        ys_in_lens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced decode → (B, L, vocab) logits."""
        b, l = ys_in.shape
        x = nn.Embed(self.vocab_size, self.attention_dim)(ys_in)
        x = PositionalEncoding(self.attention_dim, self.positional_dropout_rate)(
            x, deterministic=deterministic
        )
        if self.causal:
            self_mask = subsequent_mask(l)[None, :, :]  # (1, L, L)
        else:
            self_mask = jnp.ones((1, l, l), dtype=bool)
        if ys_in_lens is not None:
            self_mask = self_mask & make_non_pad_mask(ys_in_lens, l)[:, None, :]
        memory_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        for _ in range(self.num_blocks):
            x = TransformerDecoderLayer(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate,
                self.normalize_before,
                dtype=self.dtype,
            )(x, self_mask, memory, memory_mask, deterministic=deterministic)
        if self.normalize_before:
            x = nn.LayerNorm()(x)
        return nn.Dense(self.vocab_size)(x.astype(jnp.float32))

    def score_prefix(
        self,
        memory: jnp.ndarray,
        memory_lens: jnp.ndarray,
        yseq: jnp.ndarray,
        pos: jnp.ndarray,
    ) -> jnp.ndarray:
        """Log-probs of the next token after `yseq[:, :pos+1]`.

        Args:
            memory: (N, T, D) encoder output (N = batch*beam, pre-tiled).
            yseq: (N, Lmax) padded prefix (static length).
            pos: scalar or (N,) index of the last valid token in yseq.

        Returns:
            (N, vocab) log-probs.
        """
        logits = self(memory, memory_lens, yseq, None, deterministic=True)
        pos = jnp.broadcast_to(jnp.asarray(pos), (yseq.shape[0],))
        sel = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
        return nn.log_softmax(sel, axis=-1)
