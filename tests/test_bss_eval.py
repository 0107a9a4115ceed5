"""BSS Eval decomposition behavioral goldens (utils/bss_eval.py,
replacing mir_eval.separation.bss_eval_sources)."""
import numpy as np

from espnet_tpu.utils.bss_eval import bss_eval_sources


def _sources(seed=0, t=4000):
    r = np.random.RandomState(seed)
    return r.randn(2, t).astype(np.float64)


def test_perfect_reconstruction_high_sdr():
    refs = _sources()
    sdr, sir, sar, perm = bss_eval_sources(refs, refs.copy(), flen=128)
    assert (sdr > 100).all() and (sir > 100).all() and (sar > 100).all()
    assert list(perm) == [0, 1]


def test_filtered_reference_is_allowed_distortion():
    """A short filter applied to the true source is absorbed by the
    projection: SDR stays very high (BSS Eval's 512-tap invariance)."""
    refs = _sources(1)
    h = np.array([0.6, 0.0, -0.25, 0.1])
    ests = np.stack([np.convolve(r, h)[: refs.shape[1]] for r in refs])
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=64)
    # ~44 dB: exact up to the edge truncation of the convolution tail.
    # The naive sample-wise SNR of these estimates is ~0 dB.
    assert (sdr > 40).all()


def test_sir_measures_interference_ratio():
    """est_i = ref_i + 0.1 * ref_other → SIR ≈ 20 dB, SAR very high."""
    refs = _sources(2)
    ests = np.stack([refs[0] + 0.1 * refs[1], refs[1] + 0.1 * refs[0]])
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, flen=64)
    assert np.abs(sir - 20.0).max() < 1.0
    assert (sar > 50).all()
    assert np.abs(sdr - sir).max() < 1.0  # artifacts negligible
    assert list(perm) == [0, 1]


def test_additive_noise_is_artifact():
    """est = ref + noise (independent of both refs) → SAR ≈ SNR, SIR high."""
    refs = _sources(3)
    r = np.random.RandomState(99)
    noise = r.randn(*refs.shape) * 0.1
    ests = refs + noise
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=64)
    assert np.abs(sar - 20.0).max() < 1.5
    assert (sir > sar + 10).all()


def test_permutation_recovered():
    refs = _sources(4)
    ests = refs[::-1].copy()
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, flen=64)
    assert list(perm) == [1, 0]
    assert (sdr > 100).all()


def test_single_source():
    refs = _sources(5)[:1]
    sdr, sir, sar, perm = bss_eval_sources(refs, refs + 0.01, flen=32)
    assert sdr.shape == (1,) and list(perm) == [0]
