"""WaveNet vocoder (reference: espnet/nets/pytorch_backend/wavenet.py —
WaveNet:167, CausalConv1d:97, UpSampling:132; used by the VC decode
path).

Gated residual dilated causal conv stack over mu-law samples,
conditioned on frame features upsampled to sample rate. Training is one
parallel forward (all convs — MXU friendly). Generation is a lax.scan
over samples re-running the receptive-field window (correct and
jit-compiled; the queue-cached fast-generation variant is a later
optimisation).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def mulaw_encode(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """[-1,1] float → [0, mu] int."""
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((y + 1) / 2 * mu + 0.5).astype(jnp.int32)


def mulaw_decode(y: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    x = 2.0 * y.astype(jnp.float32) / mu - 1.0
    return jnp.sign(x) * ((1 + mu) ** jnp.abs(x) - 1) / mu


class WaveNet(nn.Module):
    quantize: int = 256
    layers: int = 10          # dilations 1..2^(layers/stacks-1) per stack
    stacks: int = 2
    residual_channels: int = 64
    gate_channels: int = 64
    skip_channels: int = 64
    kernel_size: int = 2
    aux_channels: int = 80    # conditioning feature dim
    upsample_factor: int = 128  # samples per feature frame

    @property
    def dilations(self):
        per = self.layers // self.stacks
        return [2 ** (i % per) for i in range(self.layers)]

    @property
    def receptive_field(self) -> int:
        return sum((self.kernel_size - 1) * d for d in self.dilations) + 1

    def setup(self):
        self.first = nn.Conv(self.residual_channels, (1,))
        self.dil_convs = [
            nn.Conv(
                2 * self.gate_channels,
                (self.kernel_size,),
                kernel_dilation=d,
                padding=[((self.kernel_size - 1) * d, 0)],  # causal
            )
            for d in self.dilations
        ]
        self.aux_convs = [
            nn.Conv(2 * self.gate_channels, (1,)) for _ in self.dilations
        ]
        self.res_convs = [
            nn.Conv(self.residual_channels, (1,)) for _ in self.dilations
        ]
        self.skip_convs = [
            nn.Conv(self.skip_channels, (1,)) for _ in self.dilations
        ]
        self.out1 = nn.Conv(self.skip_channels, (1,))
        self.out2 = nn.Conv(self.quantize, (1,))

    def _upsample(self, c: jnp.ndarray, n: int) -> jnp.ndarray:
        """(B, F, D) frame features → (B, n, D) sample-rate conditioning."""
        rep = jnp.repeat(c, self.upsample_factor, axis=1)
        if rep.shape[1] < n:
            rep = jnp.pad(rep, ((0, 0), (0, n - rep.shape[1]), (0, 0)))
        return rep[:, :n]

    def _net(self, x_emb: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = self.first(x_emb)
        skips = 0.0
        for dil, aux, res, skip in zip(
            self.dil_convs, self.aux_convs, self.res_convs, self.skip_convs
        ):
            z = dil(h) + aux(cond)
            zt, zs = jnp.split(z, 2, axis=-1)
            z = jnp.tanh(zt) * nn.sigmoid(zs)
            skips = skips + skip(z)
            h = h + res(z)
        out = nn.relu(skips)
        out = nn.relu(self.out1(out))
        return self.out2(out)  # (B, N, Q) logits

    def __call__(
        self,
        audio: jnp.ndarray,   # (B, N) float waveform in [-1, 1]
        feats: jnp.ndarray,   # (B, F, aux) conditioning frames
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, dict]:
        """Teacher-forced NLL over mu-law classes."""
        b, n = audio.shape
        targets = mulaw_encode(audio, self.quantize - 1)  # (B, N)
        prev = jnp.concatenate(
            [jnp.full((b, 1), (self.quantize - 1) // 2, jnp.int32), targets[:, :-1]],
            axis=1,
        )
        x_emb = jax.nn.one_hot(prev, self.quantize, dtype=jnp.float32)
        cond = self._upsample(feats, n)
        logits = self._net(x_emb, cond)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss = nll.mean()
        acc = (jnp.argmax(logits, -1) == targets).mean()
        return loss, {"loss": loss, "acc": acc}

    def generate(
        self,
        feats: jnp.ndarray,   # (1, F, aux)
        n_samples: int,
        key: Optional[jax.Array] = None,
        greedy: bool = True,
    ) -> jnp.ndarray:
        """Autoregressive sampling → (n_samples,) waveform in [-1, 1]."""
        rf = self.receptive_field
        cond = self._upsample(feats, n_samples)  # (1, N, aux)
        cond = jnp.pad(cond, ((0, 0), (rf, 0), (0, 0)))
        buf0 = jnp.full((rf,), (self.quantize - 1) // 2, jnp.int32)
        key = key if key is not None else jax.random.PRNGKey(0)

        def step(carry, i):
            buf, key = carry
            x_emb = jax.nn.one_hot(buf[None], self.quantize, dtype=jnp.float32)
            c_win = jax.lax.dynamic_slice(
                cond, (0, i + 1, 0), (1, rf, cond.shape[-1])
            )
            logits = self._net(x_emb, c_win)[0, -1]
            if greedy:
                tok = jnp.argmax(logits)
            else:
                key, sub = jax.random.split(key)
                tok = jax.random.categorical(sub, logits)
            buf = jnp.concatenate([buf[1:], tok[None].astype(jnp.int32)])
            return (buf, key), tok

        _, toks = jax.lax.scan(step, (buf0, key), jnp.arange(n_samples))
        return mulaw_decode(toks, self.quantize - 1)
