"""iSTFT + Griffin-Lim vocoder (reference: espnet2/utils/griffin_lim.py
Spectrogram2Waveform:109, utils/convert_fbank_to_wav.py).

logmel → (pseudo-inverse mel) → linear magnitude → iterative phase
recovery, all in JAX (the iteration is a lax.fori_loop of rFFT/irFFT —
runs on device).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import hann_window, mel_filterbank


def istft(
    spec: jnp.ndarray,  # (B, T, F) complex, onesided
    n_fft: int = 512,
    hop_length: int = 128,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with hann-window overlap-add and window-square
    normalisation; inverse of ops.stft.stft."""
    b, t, f = spec.shape
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (B, T, n_fft)
    frames = frames * win

    out_len = n_fft + hop_length * (t - 1)
    # overlap-add via scatter
    idx = (np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len))
    sig = sig.at[:, idx].add(frames.reshape(b, -1))
    wsq = jnp.zeros((out_len,))
    wsq = wsq.at[idx].add(jnp.tile(win**2, (t,)))
    sig = sig / jnp.maximum(wsq, 1e-8)[None]
    if center:
        pad = n_fft // 2
        sig = sig[:, pad: out_len - pad]
    return sig


def mel_to_linear(
    logmel: jnp.ndarray,  # (B, T, n_mels) natural-log mel
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jnp.ndarray:
    """Pseudo-inverse mel basis → linear POWER spectrogram (B, T, F)."""
    basis = mel_filterbank(fs, n_fft, n_mels, fmin, fmax)  # (F, M)
    inv = np.linalg.pinv(basis.T)  # (M→F): (F, M) pinv of (M, F)
    power = jnp.exp(logmel) @ jnp.asarray(inv.T)  # (B, T, F)
    return jnp.maximum(power, 1e-10)


def griffin_lim(
    magnitude: jnp.ndarray,  # (B, T, F) linear magnitude
    n_fft: int = 512,
    hop_length: int = 128,
    n_iter: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """Iterative phase reconstruction → waveform (B, N)."""
    from espnet_tpu.ops.stft import stft

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)
    spec = magnitude * jnp.exp(1j * phase)

    def body(i, spec):
        wav = istft(spec, n_fft, hop_length)
        re_spec, _ = stft(wav, None, n_fft, hop_length)
        t = min(re_spec.shape[1], magnitude.shape[1])
        angle = re_spec[:, : magnitude.shape[1]] / jnp.maximum(
            jnp.abs(re_spec[:, : magnitude.shape[1]]), 1e-10
        )
        return magnitude * angle

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop_length)


def logmel_to_wav(
    logmel: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    n_iter: int = 32,
) -> jnp.ndarray:
    power = mel_to_linear(logmel, fs, n_fft, n_mels, fmin, fmax)
    return griffin_lim(jnp.sqrt(power), n_fft, hop_length, n_iter)
