"""BSS Eval source-separation metrics (SDR / SIR / SAR).

Replaces the reference's `mir_eval.separation.bss_eval_sources` dependency
(espnet2/bin/enh_scoring.py:8) with an own implementation of the BSS Eval
v3 decomposition (Vincent, Gribonval, Fevotte, "Performance measurement in
blind audio source separation", IEEE TASLP 2006):

each estimate is decomposed as  est = s_target + e_interf + e_artif  where
- s_target  = least-squares projection of est onto the span of the
  0..flen-1 sample delays of the TRUE source,
- e_interf  = projection onto the span of ALL sources' delays minus
  s_target,
- e_artif   = the residual.

SDR = 10log10 |s_target|^2 / |e_interf + e_artif|^2
SIR = 10log10 |s_target|^2 / |e_interf|^2
SAR = 10log10 |s_target + e_interf|^2 / |e_artif|^2

All permutations of (estimate, reference) pairings are evaluated and the
one with the highest mean SIR is returned, as mir_eval does. Pure
numpy/scipy host-side evaluation code (not a training loss — the in-graph
losses live in models/enh).
"""
from __future__ import annotations

from itertools import permutations
from typing import Tuple

import numpy as np
from scipy.linalg import toeplitz
from scipy.signal import fftconvolve

EPS = np.finfo(np.float64).eps


def _delay_projector(refs: np.ndarray, flen: int):
    """Precompute the Gram matrix of delayed references.

    refs: (nsrc, T). Returns (G, ref_ffts, n2) where G is the
    (nsrc*flen, nsrc*flen) Gram matrix G[i*flen+k, j*flen+l] =
    <ref_i shifted by k, ref_j shifted by l>.
    """
    nsrc, t = refs.shape
    n = t + flen - 1
    n2 = 1 << (n - 1).bit_length()
    f = np.fft.rfft(refs, n2, axis=1)
    g = np.zeros((nsrc * flen, nsrc * flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            # c[m] = sum_u ref_i[u] * ref_j[u+m]; negative lags wrap
            cc = np.fft.irfft(np.conj(f[i]) * f[j], n2)
            col = cc[:flen]                       # m = k-l >= 0
            row = np.r_[cc[0], cc[n2 - 1 : n2 - flen : -1]]  # m <= 0
            block = toeplitz(col, row)
            g[i * flen : (i + 1) * flen, j * flen : (j + 1) * flen] = block
            if j > i:
                g[j * flen : (j + 1) * flen, i * flen : (i + 1) * flen] = block.T
    return g, f, n2


def _project(refs, g, ref_ffts, n2, est, flen, src_idx=None):
    """LS projection of est onto delayed refs (all, or one source)."""
    nsrc, t = refs.shape
    ef = np.fft.rfft(est, n2)
    d = np.zeros(nsrc * flen)
    for i in range(nsrc):
        cc = np.fft.irfft(np.conj(ref_ffts[i]) * ef, n2)
        d[i * flen : (i + 1) * flen] = cc[:flen]
    if src_idx is not None:
        sl = slice(src_idx * flen, (src_idx + 1) * flen)
        gsub, dsub = g[sl, sl], d[sl]
        try:
            c = np.linalg.solve(gsub, dsub)
        except np.linalg.LinAlgError:
            c = np.linalg.lstsq(gsub, dsub, rcond=None)[0]
        return fftconvolve(refs[src_idx], c)[: t + flen - 1]
    try:
        c = np.linalg.solve(g, d)
    except np.linalg.LinAlgError:
        c = np.linalg.lstsq(g, d, rcond=None)[0]
    proj = np.zeros(t + flen - 1)
    for i in range(nsrc):
        proj += fftconvolve(refs[i], c[i * flen : (i + 1) * flen])[: t + flen - 1]
    return proj


def _db(num: float, den: float) -> float:
    return float(10.0 * np.log10((num + EPS) / (den + EPS)))


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    flen: int = 512,
    compute_permutation: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(nsrc, T) refs + ests → (sdr, sir, sar, perm), each (nsrc,).

    perm[i] is the reference index assigned to estimate i, chosen to
    maximise mean SIR over all permutations (mir_eval convention is the
    transpose — the source index for each estimate — which is what the
    scoring CLI needs either way).
    """
    refs = np.atleast_2d(np.asarray(reference_sources, np.float64))
    ests = np.atleast_2d(np.asarray(estimated_sources, np.float64))
    if refs.shape != ests.shape:
        raise ValueError(f"shape mismatch {refs.shape} vs {ests.shape}")
    nsrc, t = refs.shape
    g, ref_ffts, n2 = _delay_projector(refs, flen)

    # metrics[i][j] = (sdr, sir, sar) of estimate i against true source j
    metrics = np.zeros((nsrc, nsrc, 3))
    for i in range(nsrc):
        est = ests[i]
        proj_all = _project(refs, g, ref_ffts, n2, est, flen)
        est_pad = np.r_[est, np.zeros(flen - 1)]
        e_artif = est_pad - proj_all
        for j in range(nsrc):
            s_target = _project(refs, g, ref_ffts, n2, est, flen, src_idx=j)
            e_interf = proj_all - s_target
            p_target = float(np.sum(s_target**2))
            metrics[i, j, 0] = _db(p_target, np.sum((e_interf + e_artif) ** 2))
            metrics[i, j, 1] = _db(p_target, np.sum(e_interf**2))
            metrics[i, j, 2] = _db(
                np.sum((s_target + e_interf) ** 2), np.sum(e_artif**2)
            )

    if compute_permutation and nsrc > 1:
        best, best_sir = None, -np.inf
        for perm in permutations(range(nsrc)):
            mean_sir = np.mean([metrics[i, p, 1] for i, p in enumerate(perm)])
            if mean_sir > best_sir:
                best_sir, best = mean_sir, perm
        perm = np.asarray(best)
    else:
        perm = np.arange(nsrc)
    sdr = np.array([metrics[i, p, 0] for i, p in enumerate(perm)])
    sir = np.array([metrics[i, p, 1] for i, p in enumerate(perm)])
    sar = np.array([metrics[i, p, 2] for i, p in enumerate(perm)])
    return sdr, sir, sar, perm
