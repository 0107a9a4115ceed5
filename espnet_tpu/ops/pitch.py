"""F0 (pitch) and energy extraction for FastSpeech2 targets
(reference: espnet2/tts/feats_extract/dio.py:27 [pyworld DIO],
energy.py:23). pyworld is a C++ dependency; here F0 comes from a
normalized-autocorrelation tracker (numpy, host-side data prep) with the
same output contract: frame-level F0, token-averaged via durations.
"""
from __future__ import annotations

import numpy as np


def extract_f0(
    wav: np.ndarray,
    fs: int = 16000,
    frame_shift: int = 128,
    frame_length: int = 512,
    fmin: float = 71.0,
    fmax: float = 400.0,
) -> np.ndarray:
    """Frame-level F0 (Hz), 0 for unvoiced. Returns (n_frames,)."""
    n = len(wav)
    n_frames = n // frame_shift + 1
    f0 = np.zeros(n_frames, dtype=np.float32)
    lag_min = int(fs / fmax)
    lag_max = min(int(fs / fmin), frame_length - 1)
    pad = frame_length // 2
    x = np.pad(wav.astype(np.float64), (pad, pad))
    for i in range(n_frames):
        start = i * frame_shift
        frame = x[start: start + frame_length]
        frame = frame - frame.mean()
        energy = (frame**2).sum()
        if energy < 1e-8:
            continue
        # normalized autocorrelation via FFT
        spec = np.fft.rfft(frame, 2 * frame_length)
        ac = np.fft.irfft(spec * np.conj(spec))[:frame_length]
        ac = ac / (ac[0] + 1e-12)
        seg = ac[lag_min:lag_max]
        if len(seg) == 0:
            continue
        peak = np.argmax(seg)
        if seg[peak] > 0.3:  # voicing threshold
            f0[i] = fs / (lag_min + peak)
    return f0


def extract_energy(
    wav: np.ndarray, frame_shift: int = 128, frame_length: int = 512
) -> np.ndarray:
    """Frame RMS energy (n_frames,)."""
    n = len(wav)
    n_frames = n // frame_shift + 1
    pad = frame_length // 2
    x = np.pad(wav.astype(np.float64), (pad, pad))
    out = np.zeros(n_frames, dtype=np.float32)
    for i in range(n_frames):
        frame = x[i * frame_shift: i * frame_shift + frame_length]
        out[i] = np.sqrt((frame**2).mean() + 1e-12)
    return out


def average_by_duration(
    values: np.ndarray, durations: np.ndarray
) -> np.ndarray:
    """Frame values → token-averaged (over voiced/nonzero frames;
    reference fastspeech2.py token-averaged continuous pitch)."""
    out = np.zeros(len(durations), dtype=np.float32)
    pos = 0
    for i, d in enumerate(durations):
        seg = values[pos: pos + d]
        nz = seg[seg > 0]
        out[i] = nz.mean() if len(nz) else 0.0
        pos += d
    return out


def extract_f0_nccf(
    wav: np.ndarray,
    fs: int = 16000,
    frame_shift: int = 128,
    frame_length: int = 512,
    fmin: float = 71.0,
    fmax: float = 400.0,
):
    """Like extract_f0 but also returns the per-frame peak normalized
    autocorrelation (NCCF-like voicing evidence) used for the POV
    feature. Returns (f0, nccf), each (n_frames,)."""
    n = len(wav)
    n_frames = n // frame_shift + 1
    f0 = np.zeros(n_frames, dtype=np.float32)
    nccf = np.zeros(n_frames, dtype=np.float32)
    lag_min = int(fs / fmax)
    lag_max = min(int(fs / fmin), frame_length - 1)
    pad = frame_length // 2
    x = np.pad(wav.astype(np.float64), (pad, pad))
    for i in range(n_frames):
        start = i * frame_shift
        frame = x[start: start + frame_length]
        frame = frame - frame.mean()
        energy = (frame**2).sum()
        if energy < 1e-8:
            continue
        spec = np.fft.rfft(frame, 2 * frame_length)
        ac = np.fft.irfft(spec * np.conj(spec))[:frame_length]
        ac = ac / (ac[0] + 1e-12)
        seg = ac[lag_min:lag_max]
        if len(seg) == 0:
            continue
        peak = int(np.argmax(seg))
        nccf[i] = seg[peak]
        if seg[peak] > 0.3:
            f0[i] = fs / (lag_min + peak)
    return f0, nccf


def pitch_feats(
    wav: np.ndarray,
    fs: int = 16000,
    frame_shift: int = 128,
    frame_length: int = 512,
    fmin: float = 71.0,
    fmax: float = 400.0,
    norm_window: int = 151,
) -> np.ndarray:
    """Kaldi-style 3-dim pitch features (n_frames, 3): [POV feature,
    mean-normalized log-pitch, delta-pitch].

    Parity target: the `make_fbank_pitch.sh` stage of espnet1 recipes
    (SURVEY A.6 — 80 fbank + 3 pitch = 83 dims), computed by Kaldi's
    compute-and-process-kaldi-pitch-feats (Ghahremani et al. 2014). Here:
    POV = squashed peak autocorrelation; log-pitch is linearly
    interpolated through unvoiced stretches then mean-subtracted over a
    sliding window; delta is the 2-point slope.
    """
    f0, nccf = extract_f0_nccf(
        wav, fs, frame_shift, frame_length, fmin, fmax
    )
    n = len(f0)
    # probability-of-voicing feature from the autocorrelation peak
    pov = (2.0 / (1.0 + np.exp(-5.0 * np.clip(nccf, 0.0, 1.0))) - 1.0).astype(
        np.float32
    )
    # interpolate f0 through unvoiced frames so log-pitch is continuous
    voiced = f0 > 0
    if voiced.any():
        idx = np.arange(n)
        f0_i = np.interp(idx, idx[voiced], f0[voiced])
    else:
        f0_i = np.full(n, (fmin + fmax) / 2.0)
    logp = np.log(np.maximum(f0_i, 1e-3)).astype(np.float32)
    # sliding-window mean subtraction (Kaldi normalization analog)
    half = norm_window // 2
    csum = np.cumsum(np.pad(logp, (1, 0)))
    lo = np.maximum(np.arange(n) - half, 0)
    hi = np.minimum(np.arange(n) + half + 1, n)
    mean = (csum[hi] - csum[lo]) / np.maximum(hi - lo, 1)
    norm_logp = logp - mean.astype(np.float32)
    delta = np.zeros(n, dtype=np.float32)
    if n > 1:
        delta[1:-1] = (logp[2:] - logp[:-2]) / 2.0
        delta[0] = logp[1] - logp[0]
        delta[-1] = logp[-1] - logp[-2]
    return np.stack([pov, norm_logp, delta], axis=1)
