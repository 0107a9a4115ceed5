"""Tacotron extras: ZoneOutCell and the CBHG post-module
(reference: tacotron2/decoder.py ZoneOutCell:23, tacotron2/cbhg.py:57).
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class ZoneOutLSTMCell(nn.Module):
    """LSTM cell with zoneout regularisation: with prob p, carry states
    keep their previous value instead of updating (train time); at eval
    the update is the expectation (1-p)*new + p*old."""

    features: int
    zoneout_rate: float = 0.1

    @nn.compact
    def __call__(self, carry, x, deterministic: bool = True):
        cell = nn.LSTMCell(self.features)
        (c_old, h_old) = carry
        (c_new, h_new), y = cell((c_old, h_old), x)
        p = self.zoneout_rate
        if p == 0.0:
            return (c_new, h_new), y
        if deterministic:
            c = (1 - p) * c_new + p * c_old
            h = (1 - p) * h_new + p * h_old
        else:
            rng_c = self.make_rng("dropout")
            rng_h = self.make_rng("dropout")
            mask_c = jax.random.bernoulli(rng_c, p, c_new.shape)
            mask_h = jax.random.bernoulli(rng_h, p, h_new.shape)
            c = jnp.where(mask_c, c_old, c_new)
            h = jnp.where(mask_h, h_old, h_new)
        return (c, h), h


class CBHG(nn.Module):
    """Conv-bank + highway + bidirectional GRU post module: refines
    predicted mel into linear spectrogram (cbhg.py:57)."""

    out_dim: int = 257           # linear spectrogram bins
    conv_bank_k: int = 8
    conv_bank_chans: int = 128
    proj_chans: int = 128
    highway_layers: int = 4
    gru_units: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, ilens: jnp.ndarray, deterministic=True):
        """(B, T, D) → (B, T, out_dim)."""
        d_in = x.shape[-1]
        banks = []
        for k in range(1, self.conv_bank_k + 1):
            h = nn.Conv(self.conv_bank_chans, (k,), padding="SAME")(x)
            h = nn.GroupNorm(num_groups=1)(h)
            banks.append(nn.relu(h))
        h = jnp.concatenate(banks, axis=-1)
        # max-pool along time, stride 1
        h = nn.max_pool(h, (2,), strides=(1,), padding="SAME")
        h = nn.relu(nn.GroupNorm(num_groups=1)(nn.Conv(self.proj_chans, (3,), padding="SAME")(h)))
        h = nn.GroupNorm(num_groups=1)(nn.Conv(d_in, (3,), padding="SAME")(h))
        h = h + x  # residual
        if h.shape[-1] != self.proj_chans:
            h = nn.Dense(self.proj_chans)(h)
        for _ in range(self.highway_layers):
            t_gate = nn.sigmoid(nn.Dense(self.proj_chans)(h))
            relu = nn.relu(nn.Dense(self.proj_chans)(h))
            h = t_gate * relu + (1 - t_gate) * h
        fwd = nn.RNN(nn.GRUCell(self.gru_units))(h, seq_lengths=ilens)
        bwd = nn.RNN(nn.GRUCell(self.gru_units), reverse=True, keep_order=True)(
            h, seq_lengths=ilens
        )
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out_dim)(h)
