"""STOI intelligibility metric (utils/stoi.py) — behavioural tests.

No pystoi golden is available offline, so we verify the published
algorithm's defining properties: identity ≈ 1, monotone degradation
with additive-noise SNR, robustness to silence and length mismatch.
"""
import numpy as np
import pytest

from espnet_tpu.utils.stoi import (
    remove_silent_frames,
    stoi,
    third_octave_band_matrix,
)


def _speechlike(n, fs, seed=0):
    """Amplitude-modulated multi-tone signal with speech-band content
    and 4 Hz envelope modulation (what STOI measures)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    x = np.zeros(n)
    for f0 in (220.0, 450.0, 900.0, 1800.0, 3100.0):
        x += rng.uniform(0.5, 1.0) * np.sin(
            2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi)
        )
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t + 1.0)
    return (x * env).astype(np.float64)


FS = 16000


def test_identity_is_one():
    x = _speechlike(FS * 2, FS)
    s = stoi(x, x, FS)
    assert s == pytest.approx(1.0, abs=1e-6)


def test_monotone_in_snr():
    x = _speechlike(FS * 2, FS)
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x))
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)

    def at_snr(db):
        return stoi(x, x + noise * 10 ** (-db / 20.0), FS)

    s20, s5, sm5 = at_snr(20), at_snr(5), at_snr(-5)
    assert s20 > s5 > sm5
    # multi-tone "speech" leaves some third-octave bands noise-only, so
    # the clean-signal ceiling sits lower than for broadband speech
    assert s20 > 0.75
    assert sm5 < 0.65


def test_noise_only_is_low():
    x = _speechlike(FS * 2, FS)
    rng = np.random.RandomState(2)
    y = rng.randn(len(x)) * x.std()
    assert stoi(x, y, FS) < 0.4


def test_silence_removal():
    x = _speechlike(FS, FS)
    sil = np.zeros(FS // 2)
    x_pad = np.concatenate([sil, x, sil])
    # identity still scores 1 with long silent stretches
    assert stoi(x_pad, x_pad, FS) == pytest.approx(1.0, abs=1e-6)
    xs, ys = remove_silent_frames(x_pad, x_pad)
    assert len(xs) < len(x_pad)  # silence actually dropped


def test_length_mismatch_and_short_signal():
    x = _speechlike(FS * 2, FS)
    assert np.isfinite(stoi(x, x[:-100], FS))
    assert np.isnan(stoi(x[:512], x[:512], FS))  # too short to score


def test_band_matrix_covers_speech_bins():
    obm = third_octave_band_matrix()
    # 15 bands, contiguous non-overlapping coverage from ~140 Hz to ~4.3 kHz
    assert obm.shape == (15, 257)
    assert (obm.sum(axis=0) <= 1.0).all()
    per_band = obm.sum(axis=1)
    assert (per_band > 0).all()
    f = np.linspace(0, 5000, 257)
    covered = f[obm.sum(axis=0) > 0]
    assert covered.min() < 200 and covered.max() > 4000
