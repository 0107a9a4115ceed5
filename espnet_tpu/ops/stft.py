"""STFT + log-mel feature frontend, TPU-native.

Capability parity with the reference's differentiable frontend
(espnet2/layers/stft.py:14, espnet2/layers/log_mel.py:24): hann window,
center/reflect padding, onesided rFFT, slaney mel filterbank
(librosa-compatible, htk=False, slaney area norm), log(max(1e-10, mel)).

Design notes (TPU): framing is a static gather, the FFT is jnp.fft.rfft
(XLA lowers small rFFTs efficiently), and the mel projection is a single
(B*T, F) x (F, M) matmul that rides the MXU. Everything is shape-static
and jit/pjit friendly; frame counts are computed from static maxlen while
per-utterance validity is carried in `olens`.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic hann window (matches torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
) -> np.ndarray:
    """Librosa-compatible mel filterbank, shape ``(n_fft//2+1, n_mels)``.

    Triangular filters over FFT bin frequencies with slaney area
    normalisation (librosa.filters.mel defaults, as used by the reference's
    espnet2/layers/log_mel.py:49).
    """
    if fmax is None:
        fmax = fs / 2.0
    # a band edge above Nyquist would leave empty (all-zero) top filters →
    # constant log(eps) channels whose zero variance explodes MVN
    fmax = min(fmax, fs / 2.0)
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, fs / 2.0, n_freqs)

    hz2mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    mel2hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney
    mel_pts = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    hz_pts = mel2hz(mel_pts)  # (n_mels+2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freqs)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalisation: each filter has unit area in Hz
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def num_frames(n_samples: int, n_fft: int = 512, hop_length: int = 128, center: bool = True) -> int:
    """Static frame count for a signal of n_samples."""
    if center:
        return n_samples // hop_length + 1
    return max(0, (n_samples - n_fft) // hop_length + 1)


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """Slice ``(B, N)`` waveform into ``(B, T, n_fft)`` frames.

    center=True reflect-pads by n_fft//2 on both sides (torch.stft
    convention)."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n = x.shape[-1]
    t = (n - n_fft) // hop_length + 1
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return x[:, idx]  # XLA gather; (B, T, n_fft)


def stft(
    x: jnp.ndarray,
    ilens: Optional[jnp.ndarray] = None,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    center: bool = True,
    window: str = "hann",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Onesided STFT of ``(B, N)`` waveforms → complex ``(B, T, n_fft//2+1)``.

    Returns (spectrum, olens) where olens are valid frame counts.
    """
    if win_length is None:
        win_length = n_fft
    frames = frame_signal(x, n_fft, hop_length, center)
    if window == "hann":
        win = hann_window(win_length)
    elif window is None:
        win = np.ones(win_length, dtype=np.float32)
    else:
        raise ValueError(f"unsupported window: {window}")
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * jnp.asarray(win), n=n_fft, axis=-1)
    if ilens is not None:
        if center:
            olens = ilens // hop_length + 1
        else:
            olens = jnp.maximum(0, (ilens - n_fft) // hop_length + 1)
    else:
        olens = None
    return spec, olens


def log_mel_spectrogram(
    x: jnp.ndarray,
    ilens: Optional[jnp.ndarray] = None,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    center: bool = True,
    htk: bool = False,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Waveform ``(B, N)`` → log-mel features ``(B, T, n_mels)``.

    Matches the reference pipeline Stft → |.|^2 → mel → log(max(eps, .))
    (espnet2/asr/frontend/default.py:19, espnet2/layers/log_mel.py:62-66).
    """
    spec, olens = stft(x, ilens, n_fft, hop_length, win_length, center)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, T, F)
    mel = power @ jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax, htk))
    logmel = jnp.log(jnp.maximum(mel, eps))
    if olens is not None:
        from espnet_tpu.utils.masks import make_non_pad_mask

        logmel = logmel * make_non_pad_mask(olens, logmel.shape[1])[..., None]
    return logmel, olens
