"""Short-Time Objective Intelligibility (STOI, Taal et al. 2011).

Own implementation of the published algorithm (no pystoi dependency —
the reference's enhancement scoring exposes STOI via the optional
`pystoi` package; here it is first-class). Reference behaviour analog:
espnet2 enhancement scoring utilities.

Algorithm (classic STOI):
  1. resample both signals to 10 kHz
  2. remove frames whose clean-signal energy is >40 dB below the peak
     frame (silence), via 256-sample 50%-overlap hann frames + OLA
  3. STFT (256-sample hann frames, hop 128, 512-point FFT)
  4. group bins into 15 one-third-octave bands starting at 150 Hz
  5. for every 30-frame (384 ms) segment and band: scale the degraded
     band envelope to the clean energy, clip at -15 dB SDR, and take
     the Pearson correlation with the clean envelope
  6. average the correlations over all segments and bands
"""
from __future__ import annotations

import numpy as np

FS = 10000  # internal sample rate
N_FRAME = 256  # frame length at 10 kHz (25.6 ms)
NFFT = 512
NUM_BANDS = 15
MIN_FREQ = 150.0  # centre frequency of the first one-third-octave band
SEG_LEN = 30  # frames per intelligibility segment (384 ms)
BETA = -15.0  # lower SDR clipping bound (dB)
DYN_RANGE = 40.0  # silent-frame removal threshold (dB)


def _hann(n: int) -> np.ndarray:
    # periodic-like hann without zero endpoints (matches the published
    # MATLAB implementation's hanning(n))
    return np.hanning(n + 2)[1:-1]


def _resample(x: np.ndarray, fs: int) -> np.ndarray:
    if fs == FS:
        return x.astype(np.float64)
    from scipy.signal import resample_poly

    g = np.gcd(int(fs), FS)
    return resample_poly(x.astype(np.float64), FS // g, fs // g)


def _frames(x: np.ndarray, flen: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(x) - flen)) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def remove_silent_frames(
    x: np.ndarray, y: np.ndarray, dyn_range: float = DYN_RANGE,
    flen: int = N_FRAME, hop: int = N_FRAME // 2,
):
    """Drop frames where the clean signal x is >dyn_range dB below its
    loudest frame; reconstruct both signals by overlap-add of the kept
    frames."""
    w = _hann(flen)
    xf = _frames(x, flen, hop) * w
    yf = _frames(y, flen, hop) * w
    energy = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    keep = energy > energy.max() - dyn_range
    xf, yf = xf[keep], yf[keep]
    n_kept = xf.shape[0]
    if n_kept == 0:
        return np.zeros(0), np.zeros(0)
    out_len = flen + (n_kept - 1) * hop
    xs = np.zeros(out_len)
    ys = np.zeros(out_len)
    norm = np.zeros(out_len)
    for i in range(n_kept):
        s = i * hop
        xs[s : s + flen] += xf[i]
        ys[s : s + flen] += yf[i]
        norm[s : s + flen] += w**2
    norm = np.maximum(norm, 1e-12)
    return xs / norm * 1.0, ys / norm * 1.0


def third_octave_band_matrix(
    fs: int = FS, nfft: int = NFFT, num_bands: int = NUM_BANDS,
    min_freq: float = MIN_FREQ,
) -> np.ndarray:
    """(num_bands, nfft//2+1) 0/1 matrix selecting each band's bins."""
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    k = np.arange(num_bands, dtype=np.float64)
    cf = min_freq * 2.0 ** (k / 3.0)
    lo = cf / 2.0 ** (1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for j in range(num_bands):
        # each bin assigned to the band whose edges bracket it (nearest
        # band wins at boundaries, as in the published implementation)
        lo_idx = np.argmin((f - lo[j]) ** 2)
        hi_idx = np.argmin((f - hi[j]) ** 2)
        obm[j, lo_idx:hi_idx] = 1.0
    return obm


def _band_envelopes(x: np.ndarray, obm: np.ndarray) -> np.ndarray:
    """(T_frames, num_bands) one-third-octave magnitude envelopes."""
    w = _hann(N_FRAME)
    xf = _frames(x, N_FRAME, N_FRAME // 2) * w
    spec = np.fft.rfft(xf, NFFT, axis=1)  # (T, nfft//2+1)
    power = np.abs(spec) ** 2
    return np.sqrt(power @ obm.T)  # (T, J)


def stoi(ref: np.ndarray, est: np.ndarray, fs: int) -> float:
    """STOI intelligibility score of `est` against clean `ref`
    (typically ~0..1, higher = more intelligible)."""
    if len(ref) != len(est):
        n = min(len(ref), len(est))
        ref, est = ref[:n], est[:n]
    x = _resample(np.asarray(ref, np.float64), fs)
    y = _resample(np.asarray(est, np.float64), fs)
    x, y = remove_silent_frames(x, y)
    if len(x) < N_FRAME * 2:
        return float("nan")  # too little speech to score
    obm = third_octave_band_matrix()
    X = _band_envelopes(x, obm)  # (T, J)
    Y = _band_envelopes(y, obm)
    t = X.shape[0]
    if t < SEG_LEN:
        return float("nan")
    clip_gain = 10.0 ** (-BETA / 20.0)
    scores = []
    for m in range(SEG_LEN, t + 1):
        Xs = X[m - SEG_LEN : m]  # (N, J)
        Ys = Y[m - SEG_LEN : m]
        alpha = np.linalg.norm(Xs, axis=0, keepdims=True) / (
            np.linalg.norm(Ys, axis=0, keepdims=True) + 1e-12
        )
        Yn = np.minimum(Ys * alpha, Xs * (1.0 + clip_gain))
        xm = Xs - Xs.mean(axis=0, keepdims=True)
        ym = Yn - Yn.mean(axis=0, keepdims=True)
        num = (xm * ym).sum(axis=0)
        den = np.linalg.norm(xm, axis=0) * np.linalg.norm(ym, axis=0) + 1e-12
        scores.append(num / den)
    return float(np.mean(scores))
