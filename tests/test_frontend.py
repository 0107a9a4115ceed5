"""Frontend golden tests: STFT/log-mel vs torch.stft and reference-style
librosa mel conventions (slaney, htk=False)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from espnet_tpu.ops.stft import (
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
    stft,
)


def test_stft_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4000).astype(np.float32)
    spec, olens = stft(jnp.asarray(x), jnp.array([4000, 3000]), n_fft=512, hop_length=128)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=512,
        hop_length=128,
        window=torch.hann_window(512),
        center=True,
        return_complex=True,
    ).transpose(1, 2)  # (B, T, F)
    np.testing.assert_allclose(
        np.asarray(spec), ref.numpy(), rtol=1e-4, atol=1e-3
    )
    assert spec.shape[1] == num_frames(4000, 512, 128)
    assert int(olens[1]) == 3000 // 128 + 1


def test_mel_filterbank_slaney_properties():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # each filter is nonzero somewhere and area-normalised (slaney)
    assert (fb.sum(axis=0) > 0).all()


def test_log_mel_shapes_and_masking():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8000).astype(np.float32)
    feats, olens = log_mel_spectrogram(jnp.asarray(x), jnp.array([8000, 4000]))
    assert feats.shape == (2, 8000 // 128 + 1, 80)
    t1 = int(olens[1])
    assert np.all(np.asarray(feats)[1, t1:] == 0.0)
    assert np.isfinite(np.asarray(feats)).all()


def test_log_mel_jit_and_grad():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 2000).astype(np.float32))
    f = jax.jit(lambda w: log_mel_spectrogram(w)[0].sum())
    g = jax.grad(lambda w: log_mel_spectrogram(w)[0].sum())(x)
    assert np.isfinite(float(f(x)))
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
