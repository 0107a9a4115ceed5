"""Mel-cepstral distortion for TTS evaluation (reference:
utils/mcd_calculate.py, which uses pysptk mcep + fastdtw; neither is
available here, so mel-cepstra come from a DCT of the log-mel
spectrogram and alignment from an exact O(T²) DTW — equivalent metric
definition: MCD = (10/ln10)·sqrt(2·Σ_{d≥1}(c_d − c'_d)²) averaged over
the aligned path)."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def mel_cepstrum(wav: np.ndarray, fs: int = 16000, n_fft: int = 1024,
                 hop_length: int = 256, n_mels: int = 40, n_mcep: int = 13
                 ) -> np.ndarray:
    """waveform → (T, n_mcep) mel-cepstra (DCT-II of log-mel)."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.ops.stft import log_mel_spectrogram

    feats, _ = log_mel_spectrogram(
        jnp.asarray(wav, jnp.float32)[None], None, fs=fs, n_fft=n_fft,
        hop_length=hop_length, n_mels=n_mels,
    )
    logmel = np.asarray(feats[0])  # (T, M)
    m = logmel.shape[1]
    # orthonormal DCT-II basis
    k = np.arange(n_mcep)[:, None]
    n = np.arange(m)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * m))
    basis[0] *= 1.0 / np.sqrt(2.0)
    basis *= np.sqrt(2.0 / m)
    return logmel @ basis.T  # (T, n_mcep)


def dtw_path(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact DTW over frame-wise euclidean cost; returns aligned index
    arrays (ix, iy)."""
    tx, ty = len(x), len(y)
    cost = np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
    acc = np.full((tx + 1, ty + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, tx + 1):
        prev = np.minimum(acc[i - 1, :-1], acc[i - 1, 1:])
        # roll over j sequentially for the diagonal/left moves
        for j in range(1, ty + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]
            )
    ix, iy = [], []
    i, j = tx, ty
    while i > 0 and j > 0:
        ix.append(i - 1)
        iy.append(j - 1)
        moves = [acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]
        step = int(np.argmin(moves))
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ix[::-1]), np.array(iy[::-1])


def mcd(
    wav_ref: np.ndarray,
    wav_hyp: np.ndarray,
    fs: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 40,
    n_mcep: int = 13,
) -> float:
    """MCD in dB between two waveforms (c0 energy term excluded, DTW
    aligned)."""
    cr = mel_cepstrum(wav_ref, fs, n_fft, hop_length, n_mels, n_mcep)
    ch = mel_cepstrum(wav_hyp, fs, n_fft, hop_length, n_mels, n_mcep)
    ix, iy = dtw_path(cr[:, 1:], ch[:, 1:])  # exclude c0
    diff = cr[ix, 1:] - ch[iy, 1:]
    per_frame = np.sqrt(2.0 * (diff**2).sum(axis=1))
    return float(10.0 / np.log(10.0) * per_frame.mean())
