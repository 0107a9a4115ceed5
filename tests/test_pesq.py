"""Behavioral goldens for the P.862-style PESQ implementation
(utils/pesq.py): clean → top score, monotone in SNR, delay-invariant,
gain-invariant."""
import numpy as np
import pytest

from espnet_tpu.utils.pesq import pesq


def _speechlike(seed=0, fs=8000, dur=2.0):
    """Amplitude-modulated multi-harmonic signal with pauses — enough
    structure for level/time alignment to latch onto."""
    r = np.random.RandomState(seed)
    t = np.arange(int(fs * dur)) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * phase) / k for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 1.7 * t + r.rand() * 6), 0, None)
    return (x * env + 0.01 * r.randn(len(t))).astype(np.float64)


def test_clean_is_max_score():
    x = _speechlike()
    assert pesq(x, x.copy(), 8000) > 4.3


def test_monotone_in_snr():
    x = _speechlike(1)
    r = np.random.RandomState(7)
    noise = r.randn(len(x))
    scores = []
    for snr_db in [40, 20, 10, 0, -10]:
        sigma = np.sqrt(np.mean(x**2) / 10 ** (snr_db / 10))
        scores.append(pesq(x, x + sigma * noise, 8000))
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.0  # 40 dB SNR barely audible
    assert scores[-1] < 2.5  # -10 dB SNR clearly bad


def test_gain_invariance():
    """Level alignment: a scaled copy scores like the clean copy."""
    x = _speechlike(2)
    assert pesq(x, 0.1 * x, 8000) > 4.3
    assert pesq(x, 5.0 * x, 8000) > 4.3


def test_delay_invariance():
    """Time alignment absorbs a constant delay."""
    x = _speechlike(3)
    d = np.concatenate([np.zeros(400), x])[: len(x)]
    delayed = pesq(x, d, 8000)
    assert delayed > 4.0, delayed


def test_wideband_and_moslqo():
    x = _speechlike(4, fs=16000)
    s = pesq(x, x + 0.05 * np.random.RandomState(0).randn(len(x)), 16000)
    assert 1.0 <= s <= 4.5
    m = pesq(x, x.copy(), 16000, mos_lqo=True)
    assert 1.0 <= m <= 5.0 and m > 4.0


def test_bad_fs_raises():
    x = _speechlike(5)
    with pytest.raises(ValueError):
        pesq(x, x, 44100)


def test_enh_scoring_pesq_resamples_odd_rates(tmp_path):
    """--pesq at 22.05 kHz resamples to 16 kHz instead of mis-scaling."""
    from espnet_tpu.bin import enh_scoring
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    x = _speechlike(9, fs=22050, dur=1.0).astype(np.float32)
    write_wav(tmp_path / "r.wav", 22050, x)
    write_wav(tmp_path / "e.wav", 22050, x)
    write_scp(tmp_path / "ref.scp", {"u0": str(tmp_path / "r.wav")})
    write_scp(tmp_path / "est.scp", {"u0": str(tmp_path / "e.wav")})
    summary = enh_scoring.main([
        "--ref_scp", str(tmp_path / "ref.scp"),
        "--est_scp", str(tmp_path / "est.scp"),
        "--output_dir", str(tmp_path / "score"), "--pesq",
    ])
    assert summary["pesq"] > 4.0  # identical signals → near max
