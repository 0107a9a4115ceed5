"""Speech enhancement / separation (reference: espnet2/enh/ —
ESPnetEnhancementModel espnet_model.py:16, TFMaskingNet
nets/tf_mask_net.py:12, PIT losses).

TFMaskingNet: STFT → BLSTM → per-speaker sigmoid masks → masked STFT →
iSTFT. Loss: permutation-invariant (PIT) negative SI-SNR in the time
domain, evaluated over all speaker permutations (n_spk ≤ 3 in practice,
so the permutation set is tiny and unrolled).
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.ops.griffin_lim import istft
from espnet_tpu.ops.stft import stft
from espnet_tpu.utils.masks import make_non_pad_mask


def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB, per utterance. est/ref: (B, N)."""
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True) / (jnp.sum(ref**2, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = jnp.sum(proj**2, -1) / (jnp.sum(noise**2, -1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def pit_loss(
    ests: List[jnp.ndarray], refs: List[jnp.ndarray], loss_fn=lambda e, r: -si_snr(e, r)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min-over-permutations mean loss. Returns (loss (B,), perm_index (B,))."""
    n = len(refs)
    losses = []
    perms = list(itertools.permutations(range(n)))
    for perm in perms:
        l = sum(loss_fn(ests[i], refs[p]) for i, p in enumerate(perm)) / n
        losses.append(l)
    stacked = jnp.stack(losses, axis=0)  # (P, B)
    best = jnp.argmin(stacked, axis=0)
    return jnp.min(stacked, axis=0), best


class TFMaskingNet(nn.Module):
    n_spk: int = 2
    n_fft: int = 256
    hop_length: int = 128
    units: int = 256
    layers: int = 2
    nonlinear: str = "sigmoid"

    @nn.compact
    def __call__(
        self, speech_mix: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """(B, N) mixture → list of n_spk (B, N') separated waveforms."""
        spec, flens = stft(speech_mix, lengths, self.n_fft, self.hop_length)
        mag = jnp.abs(spec)
        phase = spec / jnp.maximum(mag, 1e-8)
        x = jnp.log(jnp.maximum(mag, 1e-8))
        for _ in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.units))(x, seq_lengths=flens)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.units), reverse=True, keep_order=True)(
                x, seq_lengths=flens
            )
            x = jnp.concatenate([fwd, bwd], axis=-1)
        f = mag.shape[-1]
        masks = nn.Dense(self.n_spk * f)(x).reshape(
            x.shape[0], x.shape[1], self.n_spk, f
        )
        masks = nn.sigmoid(masks) if self.nonlinear == "sigmoid" else nn.relu(masks)
        outs = []
        for i in range(self.n_spk):
            est_spec = (mag * masks[:, :, i]) * phase
            outs.append(istft(est_spec, self.n_fft, self.hop_length))
        return outs, flens


class EnhancementModel(nn.Module):
    """Separator + PIT SI-SNR loss (espnet2/enh/espnet_model.py:16)."""

    separator: nn.Module
    n_spk: int = 2

    def __call__(
        self,
        speech_mix: jnp.ndarray,
        speech_mix_lengths: jnp.ndarray,
        speech_ref: jnp.ndarray,  # (B, n_spk, N)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        ests, _ = self.separator(speech_mix, speech_mix_lengths)
        n = min(ests[0].shape[-1], speech_ref.shape[-1])
        mask = make_non_pad_mask(speech_mix_lengths, n).astype(ests[0].dtype)
        ests = [e[:, :n] * mask for e in ests]
        refs = [speech_ref[:, i, :n] * mask for i in range(self.n_spk)]
        loss_b, perm = pit_loss(ests, refs)
        loss = loss_b.mean()
        return loss, {"loss": loss, "si_snr": -loss}

    def separate(self, speech_mix, lengths):
        return self.separator(speech_mix, lengths)
