"""Kaldi-style pitch features (ops/pitch.py pitch_feats, fbank --pitch
CLI; make_fbank_pitch.sh parity, SURVEY A.6)."""
import numpy as np

from espnet_tpu.ops.pitch import pitch_feats


def _tone(f0=200.0, fs=8000, dur=1.0, seed=0):
    t = np.arange(int(fs * dur)) / fs
    r = np.random.RandomState(seed)
    return np.sin(2 * np.pi * f0 * t) + 0.005 * r.randn(len(t))


def test_pitch_feats_shape_and_voicing():
    fs = 8000
    x = _tone(200.0, fs)
    p = pitch_feats(x, fs=fs, frame_shift=80, frame_length=320)
    assert p.shape[1] == 3
    assert np.isfinite(p).all()
    # a clean tone is confidently voiced: POV near 1 in the interior
    assert p[10:-10, 0].mean() > 0.7


def test_pitch_feats_tracks_f0():
    """delta-pitch sign follows an F0 step; log-pitch mean-norm ~0."""
    fs = 8000
    lo = _tone(150.0, fs, 0.5, 1)
    hi = _tone(300.0, fs, 0.5, 2)
    x = np.concatenate([lo, hi])
    p = pitch_feats(x, fs=fs, frame_shift=80, frame_length=320)
    n = len(p)
    # normalized log-pitch lower in the first half than the second
    assert p[: n // 2 - 5, 1].mean() < p[n // 2 + 5 :, 1].mean()
    assert abs(p[:, 1].mean()) < 0.5  # sliding mean-subtraction centers it


def test_pitch_feats_noise_is_unvoiced():
    r = np.random.RandomState(3)
    x = r.randn(8000) * 0.1
    p = pitch_feats(x, fs=8000, frame_shift=80, frame_length=320)
    assert p[:, 0].mean() < 0.6  # POV low for noise


def test_fbank_pitch_cli(tmp_path):
    from espnet_tpu.bin import feats_utils
    from espnet_tpu.data.kaldi_io import load_scp_entry, read_scp, write_scp
    from espnet_tpu.data.wav import write_wav

    fs = 8000
    write_wav(tmp_path / "a.wav", fs, _tone(220.0, fs).astype(np.float32) * 0.3)
    write_scp(tmp_path / "wav.scp", {"a": str(tmp_path / "a.wav")})
    feats_utils.main([
        "fbank", "--scp", str(tmp_path / "wav.scp"),
        "--out_ark", str(tmp_path / "f.ark"), "--out_scp", str(tmp_path / "f.scp"),
        "--n_mels", "20", "--n_fft", "256", "--n_shift", "80", "--pitch",
    ])
    feats = load_scp_entry(read_scp(str(tmp_path / "f.scp"))["a"])
    assert feats.shape[1] == 23  # 20 fbank + 3 pitch
    assert np.isfinite(feats).all()
