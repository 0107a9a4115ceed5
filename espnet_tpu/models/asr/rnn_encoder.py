"""RNN (VGG-BLSTM) encoder family (reference: espnet/nets/pytorch_backend/
rnn/encoders.py — RNNP:15, RNN:95, VGG2L:178, Encoder:240).

etype grammar `vgg?(b)?(lstm|gru)p?` is expressed as explicit flags.
LSTMs run as flax nn.RNN scans (XLA fuses the cell math); per-layer
projection + subsampling mirror RNNP.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class VGG2L(nn.Module):
    """2×(2conv+maxpool) VGG front, ×4 time downsample (encoders.py:178)."""

    @nn.compact
    def __call__(self, xs: jnp.ndarray, ilens: jnp.ndarray):
        b, t, d = xs.shape
        x = xs[..., None]  # (B, T, D, 1)
        for ch in (64, 128):
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
            x = nn.max_pool(
                jnp.pad(
                    x,
                    ((0, 0), (0, (-x.shape[1]) % 2), (0, (-x.shape[2]) % 2), (0, 0)),
                    constant_values=-jnp.inf,
                ),
                (2, 2),
                strides=(2, 2),
            )
        b2, t2, f2, c2 = x.shape
        olens = jnp.ceil(jnp.ceil(ilens / 2.0) / 2.0).astype(ilens.dtype)
        return x.reshape(b2, t2, f2 * c2), olens


class BiRNNLayer(nn.Module):
    units: int
    cell_type: str = "lstm"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, xs: jnp.ndarray, ilens: jnp.ndarray) -> jnp.ndarray:
        cell_cls = nn.LSTMCell if self.cell_type == "lstm" else nn.GRUCell
        fwd = nn.RNN(cell_cls(self.units))(xs, seq_lengths=ilens)
        if not self.bidirectional:
            return fwd
        bwd = nn.RNN(cell_cls(self.units), reverse=True, keep_order=True)(
            xs, seq_lengths=ilens
        )
        return jnp.concatenate([fwd, bwd], axis=-1)


class RNNEncoder(nn.Module):
    """VGG?-B?(LSTM|GRU)P? encoder → (B, T', eprojs)."""

    elayers: int = 4
    eunits: int = 300
    eprojs: int = 320
    cell_type: str = "lstm"
    bidirectional: bool = True
    use_projection: bool = True  # the "p" suffix
    use_vgg: bool = False
    subsample: Sequence[int] = (1, 1, 1, 1, 1)  # per RNNP layer
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, xs: jnp.ndarray, ilens: jnp.ndarray, deterministic: bool = True):
        if self.use_vgg:
            xs, ilens = VGG2L()(xs, ilens)
        drop = nn.Dropout(self.dropout_rate)
        if self.use_projection:
            for i in range(self.elayers):
                xs = BiRNNLayer(self.eunits, self.cell_type, self.bidirectional)(
                    xs, ilens
                )
                sub = self.subsample[i + 1] if i + 1 < len(self.subsample) else 1
                if sub > 1:
                    xs = xs[:, ::sub]
                    ilens = (ilens + sub - 1) // sub
                xs = nn.Dense(self.eprojs)(xs)
                if i < self.elayers - 1:
                    xs = jnp.tanh(xs)
                xs = drop(xs, deterministic=deterministic)
        else:
            for i in range(self.elayers):
                xs = BiRNNLayer(self.eunits, self.cell_type, self.bidirectional)(
                    xs, ilens
                )
                if i < self.elayers - 1:
                    xs = drop(xs, deterministic=deterministic)
            xs = jnp.tanh(nn.Dense(self.eprojs)(xs))
        from espnet_tpu.utils.masks import make_non_pad_mask

        xs = xs * make_non_pad_mask(ilens, xs.shape[1])[..., None]
        return xs, ilens
