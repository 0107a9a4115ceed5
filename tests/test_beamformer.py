"""MVDR beamformer + WPE tests: oracle-mask MVDR improves SNR on a
synthetic 2-channel mixture; WPE reduces reverberant energy."""
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.beamformer import (
    DNNBeamformer,
    mvdr_filter,
    psd_matrix,
    wpe_dereverb,
)
from espnet_tpu.ops.stft import stft


def _mc_mixture(seed=0, fs=8000, dur=1.0):
    """2-channel: target tone with channel delay + diffuse noise."""
    rng = np.random.RandomState(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    target = np.sin(2 * np.pi * 440 * t) * (rng.rand(n) > 0.3)
    noise = rng.randn(2, n) * 0.8
    ch0 = target + noise[0]
    ch1 = np.roll(target, 1) + noise[1]
    mix = np.stack([ch0, ch1]).astype(np.float32)  # (C, N)
    return target.astype(np.float32), mix


def test_oracle_mvdr_improves_snr():
    target, mix = _mc_mixture()
    spec_list = []
    for ch in range(2):
        s, _ = stft(jnp.asarray(mix[ch][None]), None, n_fft=256, hop_length=128)
        spec_list.append(s[0])
    spec = jnp.stack(spec_list, axis=1)[None]  # (1, T, C, F)
    tgt_spec, _ = stft(jnp.asarray(target[None]), None, 256, 128)
    tgt_mag = jnp.abs(tgt_spec[0])
    mix_mag = jnp.abs(spec[0, :, 0])
    # oracle masks
    m_s = (tgt_mag / jnp.maximum(mix_mag, 1e-8)).clip(0, 1)[None, :, None, :]
    m_s = jnp.tile(m_s, (1, 1, 2, 1))
    m_n = 1.0 - m_s
    flens = jnp.array([spec.shape[1]])
    psd_s = psd_matrix(spec, m_s, flens)
    psd_n = psd_matrix(spec, m_n, flens)
    h = mvdr_filter(psd_s, psd_n)
    enhanced = jnp.einsum("bfc,btcf->btf", jnp.conj(h), spec)

    def snr(est_spec):
        err = jnp.abs(est_spec) - tgt_mag
        return float(
            10 * jnp.log10(jnp.sum(tgt_mag**2) / jnp.maximum(jnp.sum(err**2), 1e-8))
        )

    assert snr(enhanced[0]) > snr(spec[0, :, 0]) + 1.0


def test_dnn_beamformer_forward():
    _, mix = _mc_mixture(1)
    spec_list = []
    for ch in range(2):
        s, _ = stft(jnp.asarray(mix[ch][None]), None, n_fft=128, hop_length=64)
        spec_list.append(s[0])
    spec = jnp.stack(spec_list, axis=1)[None]
    flens = jnp.array([spec.shape[1]])
    bf = DNNBeamformer(units=8, layers=1)
    variables = bf.init(jax.random.PRNGKey(0), spec, flens)
    enhanced, _, (m_s, m_n) = bf.apply(variables, spec, flens)
    assert enhanced.shape == (1, spec.shape[1], spec.shape[3])
    assert np.isfinite(np.abs(np.asarray(enhanced))).all()
    assert (np.asarray(m_s) >= 0).all() and (np.asarray(m_s) <= 1).all()


def test_wpe_reduces_reverb_energy():
    rng = np.random.RandomState(2)
    fs = 8000
    n = fs
    dry = rng.randn(n).astype(np.float32) * (rng.rand(n) > 0.5)
    # simple exponential reverb tail
    rir = np.zeros(400)
    rir[0] = 1.0
    rir[100:400] = 0.6 * np.exp(-np.arange(300) / 80.0)
    wet = np.convolve(dry, rir)[:n].astype(np.float32)
    spec, _ = stft(jnp.asarray(wet[None]), None, 256, 64)
    spec4 = spec[:, :, None, :]  # (B, T, C=1, F)
    out = wpe_dereverb(spec4, taps=8, delay=2, iterations=2)
    dry_spec, _ = stft(jnp.asarray(dry[None]), None, 256, 64)
    err_before = float(jnp.sum(jnp.abs(jnp.abs(spec) - jnp.abs(dry_spec)) ** 2))
    err_after = float(
        jnp.sum(jnp.abs(jnp.abs(out[:, :, 0]) - jnp.abs(dry_spec)) ** 2)
    )
    assert err_after < err_before, (err_before, err_after)
