"""In-graph feature frontend modules (reference:
espnet2/asr/frontend/default.py:19, espnet2/layers/global_mvn.py).

Raw waveform → STFT → power → log-mel runs inside the jitted model so the
whole pipeline stays on device; GlobalMVN stats live in a non-trainable
'norm_stats' variable collection filled by the collect-stats stage.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.ops.mvn import utterance_mvn
from espnet_tpu.ops.stft import log_mel_spectrogram


class DefaultFrontend(nn.Module):
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    win_length: Optional[int] = None
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None

    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        return log_mel_spectrogram(
            speech,
            lengths,
            fs=self.fs,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            n_mels=self.n_mels,
            fmin=self.fmin,
            fmax=self.fmax,
        )


class GlobalMVN(nn.Module):
    """Feature normalisation with persisted global stats."""

    feat_dim: int = 80
    norm_means: bool = True
    norm_vars: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, ilens: jnp.ndarray) -> jnp.ndarray:
        mean = self.variable(
            "norm_stats", "mean", lambda: jnp.zeros((self.feat_dim,))
        )
        std = self.variable(
            "norm_stats", "std", lambda: jnp.ones((self.feat_dim,))
        )
        from espnet_tpu.ops.mvn import global_mvn

        return global_mvn(x, ilens, mean.value, std.value, self.norm_means, self.norm_vars)


class UtteranceMVN(nn.Module):
    norm_means: bool = True
    norm_vars: bool = False

    def __call__(self, x: jnp.ndarray, ilens: jnp.ndarray) -> jnp.ndarray:
        return utterance_mvn(x, ilens, self.norm_means, self.norm_vars)


class BeamformerFrontend(nn.Module):
    """Multi-channel in-graph frontend: STFT → (optional) WPE dereverb →
    mask-based MVDR beamformer → power → log-mel (reference:
    espnet/nets/pytorch_backend/frontends/frontend.py:15 Frontend with
    use_wpe/use_beamformer, espnet2/asr/frontend/default.py WPE/MVDR
    hooks). Selected in ASR configs as ``frontend: beamformer``.

    speech: (B, L, C) multi-channel raw waveform (C = mics).
    Output: (B, T, n_mels) single-channel log-mel + frame lengths.
    """

    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    win_length: Optional[int] = None
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iterations: int = 1
    bf_units: int = 128
    bf_layers: int = 2
    ref_channel: int = 0

    @nn.compact
    def __call__(
        self, speech: jnp.ndarray, lengths: jnp.ndarray,
        return_wave: bool = False,
    ):
        from espnet_tpu.models.enh.beamformer import DNNBeamformer, wpe_dereverb
        from espnet_tpu.ops.stft import mel_filterbank, stft

        b, length, c = speech.shape
        flat = speech.transpose(0, 2, 1).reshape(b * c, length)
        spec, flens = stft(
            flat,
            jnp.repeat(lengths, c),
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        )
        t, f = spec.shape[1], spec.shape[2]
        spec = spec.reshape(b, c, t, f).transpose(0, 2, 1, 3)  # (B,T,C,F)
        flens = flens.reshape(b, c)[:, 0]
        if self.use_wpe:
            spec = wpe_dereverb(
                spec, taps=self.wpe_taps, delay=self.wpe_delay,
                iterations=self.wpe_iterations,
            )
        enhanced, flens, _ = DNNBeamformer(
            self.bf_units, self.bf_layers, self.ref_channel
        )(spec, flens)
        if return_wave:
            # asr_enhance output path: enhanced waveform via iSTFT
            from espnet_tpu.ops.griffin_lim import istft

            wav = istft(enhanced, self.n_fft, self.hop_length)
            return wav, flens
        power = jnp.abs(enhanced) ** 2  # (B, T, F)
        mel = jnp.asarray(
            mel_filterbank(
                fs=self.fs, n_fft=self.n_fft, n_mels=self.n_mels,
                fmin=self.fmin, fmax=self.fmax if self.fmax else None,
            ),
            power.dtype,
        )
        feats = jnp.log(jnp.maximum(power @ mel, 1e-10))
        return feats, flens
