"""Global style tokens (reference: espnet2/tts/gst/style_encoder.py):
reference encoder (conv stack + GRU) → multi-head attention over learned
style token embeddings → style embedding added to TTS encoder states.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.layers.attention import MultiHeadedAttention


class ReferenceEncoder(nn.Module):
    conv_chans: tuple = (32, 32, 64, 64, 128, 128)
    gru_units: int = 128

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) reference mel → (B, gru_units) utterance vector."""
        x = feats[..., None]
        for ch in self.conv_chans:
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.RNN(nn.GRUCell(self.gru_units))(x)
        return x[:, -1]


class StyleEncoder(nn.Module):
    n_tokens: int = 10
    token_dim: int = 256
    heads: int = 4
    gru_units: int = 128

    @nn.compact
    def __call__(self, ref_feats: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) → (B, token_dim) style embedding."""
        q = ReferenceEncoder(gru_units=self.gru_units)(ref_feats)[:, None]  # (B,1,D)
        tokens = self.param(
            "style_tokens",
            nn.initializers.normal(0.5),
            (self.n_tokens, self.token_dim),
        )
        keys = jnp.tanh(tokens)[None].repeat(q.shape[0], axis=0)  # (B, K, D)
        q = nn.Dense(self.token_dim)(q)
        out = MultiHeadedAttention(self.heads, self.token_dim)(q, keys, keys)
        return out[:, 0]
