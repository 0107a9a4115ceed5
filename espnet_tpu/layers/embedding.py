"""Positional encodings (capability parity with
espnet/nets/pytorch_backend/transformer/embedding.py:35,95,131).

All encodings are computed on the fly from static shapes — no buffers to
resize, fully jit-friendly.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sinusoid table (length, d_model), positions 0..length-1."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe, dtype=dtype)


class PositionalEncoding(nn.Module):
    """x * sqrt(d) + PE, with dropout."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        t = x.shape[1]
        x = x * jnp.sqrt(float(self.d_model)).astype(x.dtype)
        x = x + sinusoidal_table(t, self.d_model, x.dtype)[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE with learnable alpha (Transformer-TTS)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        t = x.shape[1]
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        x = x + alpha * sinusoidal_table(t, self.d_model, x.dtype)[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """Transformer-XL style: returns (scaled+dropped x, pos_emb).

    pos_emb has length 2T-1 covering relative distances T-1 .. -(T-1)
    (index p ↔ distance d = T-1-p), the convention consumed by
    RelPositionMultiHeadedAttention.
    """

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        t = x.shape[1]
        x = x * jnp.sqrt(float(self.d_model)).astype(x.dtype)
        # distances d = T-1 .. -(T-1); sin is odd in position so build from
        # the signed position directly.
        d = np.arange(t - 1, -t, -1, dtype=np.float32)[:, None]  # (2T-1, 1)
        div = np.exp(
            np.arange(0, self.d_model, 2, dtype=np.float32)
            * -(np.log(10000.0) / self.d_model)
        )
        pe = np.zeros((2 * t - 1, self.d_model), dtype=np.float32)
        pe[:, 0::2] = np.sin(d * div)
        pe[:, 1::2] = np.cos(d * div)
        pos_emb = jnp.asarray(pe, dtype=x.dtype)[None]  # (1, 2T-1, D)
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )
