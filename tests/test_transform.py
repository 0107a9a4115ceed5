"""Transformation pipeline tests (reference test/test_transform.py)."""
import numpy as np

from espnet_tpu.data.transform import (
    CMVN,
    SpeedPerturbation,
    Transformation,
    add_deltas,
    fbank,
    spectrogram,
)


def test_fbank_matches_jax_frontend():
    import jax.numpy as jnp

    from espnet_tpu.ops.stft import log_mel_spectrogram

    rng = np.random.RandomState(0)
    wav = rng.randn(4000).astype(np.float32)
    ref, _ = log_mel_spectrogram(
        jnp.asarray(wav[None]), None, fs=8000, n_fft=256, hop_length=128, n_mels=20
    )
    got = fbank(wav, fs=8000, n_fft=256, hop_length=128, n_mels=20)
    np.testing.assert_allclose(got, np.asarray(ref[0]), rtol=1e-3, atol=1e-3)


def test_cmvn_roundtrip(tmp_path):
    from espnet_tpu.data.kaldi_io import write_cmvn_stats

    rng = np.random.RandomState(1)
    feats = rng.randn(1000, 10) * 3 + 5
    write_cmvn_stats(
        tmp_path / "cmvn.ark", len(feats), feats.sum(0), (feats**2).sum(0)
    )
    t = CMVN(str(tmp_path / "cmvn.ark"))
    out = t(feats)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1, atol=1e-4)


def test_add_deltas_shape():
    x = np.random.RandomState(2).randn(20, 8).astype(np.float32)
    out = add_deltas(x, order=2)
    assert out.shape == (20, 24)
    np.testing.assert_allclose(out[:, :8], x)


def test_speed_perturbation_changes_length():
    x = np.random.RandomState(3).randn(8000).astype(np.float32)
    sp = SpeedPerturbation(0.8, 0.85, seed=0)
    out = sp(x, train=True)
    assert len(out) > len(x)  # slower speed → longer signal
    assert np.array_equal(sp(x, train=False), x)


def test_transformation_chain(tmp_path):
    conf = {
        "process": [
            {"type": "fbank", "fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 20},
            {"type": "utterance_cmvn"},
            {"type": "time_mask", "T": 5, "seed": 1},
        ]
    }
    t = Transformation(conf)
    wav = np.random.RandomState(4).randn(4000).astype(np.float32)
    out = t(wav, train=True)
    assert out.shape[1] == 20
    out_eval = t(wav, train=False)
    assert out_eval.shape == out.shape
