"""Conv-TasNet time-domain separation (reference: espnet2/enh/nets/
tasnet.py:88 TasNet).

Learned conv encoder basis → TCN separator (stacked dilated depthwise
conv blocks with global layer norm) → per-speaker masks → transposed-conv
decoder. All convs map straight to the MXU; overlap-add is a strided
transpose conv.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp


class GlobalLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # normalize over (time, channel) jointly
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, x.shape[-1]))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, x.shape[-1]))
        return (x - mean) / jnp.sqrt(var + 1e-8) * gamma + beta


class TCNBlock(nn.Module):
    bottleneck: int
    hidden: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.hidden, (1,))(x)
        h = nn.relu(h)
        h = GlobalLayerNorm()(h)
        h = nn.Conv(
            self.hidden,
            (self.kernel,),
            kernel_dilation=self.dilation,
            padding="SAME",
            feature_group_count=self.hidden,
        )(h)
        h = nn.relu(h)
        h = GlobalLayerNorm()(h)
        h = nn.Conv(self.bottleneck, (1,))(h)
        return x + h


class ConvTasNet(nn.Module):
    n_spk: int = 2
    enc_filters: int = 256   # N
    enc_kernel: int = 20     # L (samples)
    bottleneck: int = 128    # B
    hidden: int = 256        # H
    tcn_kernel: int = 3      # P
    tcn_layers: int = 4      # X (dilations 1..2^(X-1))
    tcn_stacks: int = 2      # R

    @nn.compact
    def __call__(
        self, speech_mix: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """(B, N) mixture → n_spk × (B, ~N) separated waveforms."""
        stride = self.enc_kernel // 2
        x = speech_mix[..., None]  # (B, N, 1)
        w = nn.Conv(self.enc_filters, (self.enc_kernel,), strides=stride,
                    padding="SAME", use_bias=False)(x)
        w = nn.relu(w)  # (B, T', N)
        h = GlobalLayerNorm()(w)
        h = nn.Conv(self.bottleneck, (1,))(h)
        for _ in range(self.tcn_stacks):
            for i in range(self.tcn_layers):
                h = TCNBlock(self.bottleneck, self.hidden, self.tcn_kernel, 2**i)(h)
        masks = nn.Conv(self.n_spk * self.enc_filters, (1,))(h)
        masks = nn.sigmoid(
            masks.reshape(h.shape[0], h.shape[1], self.n_spk, self.enc_filters)
        )
        outs = []
        for i in range(self.n_spk):
            src_w = w * masks[:, :, i]
            wav = nn.ConvTranspose(
                1, (self.enc_kernel,), strides=(stride,), padding="SAME",
                use_bias=False,
            )(src_w)[..., 0]
            outs.append(wav[:, : speech_mix.shape[1]])
        flens = lengths // stride + 1
        return outs, flens
