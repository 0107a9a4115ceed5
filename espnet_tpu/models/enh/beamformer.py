"""Multi-channel neural frontend: mask-based MVDR beamformer + WPE
dereverberation (reference: espnet/nets/pytorch_backend/frontends/ —
DNN_Beamformer dnn_beamformer.py:19, MaskEstimator mask_estimator.py:13,
DNN_WPE dnn_wpe.py:11).

Complex STFT math runs natively in JAX (complex64): per-frequency PSD
matrices are batched matmuls; the MVDR solve is a batched linear solve —
all MXU/XLA friendly, no torch_complex needed.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


class MaskEstimator(nn.Module):
    """BLSTM over log-magnitude → speech & noise masks per channel."""

    units: int = 128
    layers: int = 2

    @nn.compact
    def __call__(self, spec: jnp.ndarray, flens: jnp.ndarray):
        """spec: (B, T, C, F) complex → (speech_mask, noise_mask) same shape."""
        b, t, c, f = spec.shape
        x = jnp.log(jnp.maximum(jnp.abs(spec), 1e-8))
        x = x.transpose(0, 2, 1, 3).reshape(b * c, t, f)
        flens_c = jnp.repeat(flens, c)
        for _ in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.units))(x, seq_lengths=flens_c)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.units), reverse=True, keep_order=True)(
                x, seq_lengths=flens_c
            )
            x = jnp.concatenate([fwd, bwd], axis=-1)
        masks = nn.sigmoid(nn.Dense(2 * f)(x)).reshape(b, c, t, 2, f)
        masks = masks.transpose(0, 2, 1, 4, 3)  # (B, T, C, F, 2)
        return masks[..., 0], masks[..., 1]


def psd_matrix(spec: jnp.ndarray, mask: jnp.ndarray, flens: jnp.ndarray) -> jnp.ndarray:
    """Masked cross-channel PSD: spec (B,T,C,F), mask (B,T,C,F) →
    (B, F, C, C)."""
    b, t, c, f = spec.shape
    valid = make_non_pad_mask(flens, t)[:, :, None, None]
    m = (mask * valid).mean(axis=2)  # (B, T, F) average mask over channels
    sp = spec.transpose(0, 3, 1, 2)  # (B, F, T, C)
    mw = m.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
    num = jnp.einsum("bftc,bftd->bfcd", sp * mw, jnp.conj(sp))
    denom = jnp.maximum(mw.sum(axis=2), 1e-8)[..., None]
    return num / denom


def mvdr_filter(
    psd_s: jnp.ndarray, psd_n: jnp.ndarray, ref_channel: int = 0, diag_eps: float = 1e-6
) -> jnp.ndarray:
    """MVDR: h = (Φn⁻¹ Φs) / tr(Φn⁻¹ Φs) · e_ref → (B, F, C)."""
    c = psd_n.shape[-1]
    eye = jnp.eye(c, dtype=psd_n.dtype)
    psd_n_reg = psd_n + diag_eps * eye * (
        jnp.trace(psd_n, axis1=-2, axis2=-1).real[..., None, None] / c + 1.0
    )
    num = jnp.linalg.solve(psd_n_reg, psd_s)  # (B, F, C, C)
    tr = jnp.trace(num, axis1=-2, axis2=-1)[..., None, None]
    ws = num / jnp.maximum(jnp.abs(tr), 1e-8)
    return ws[..., ref_channel]  # (B, F, C)


class DNNBeamformer(nn.Module):
    """Mask-based MVDR: multi-channel STFT → single-channel STFT."""

    units: int = 128
    layers: int = 2
    ref_channel: int = 0

    def setup(self):
        self.mask_estimator = MaskEstimator(self.units, self.layers)

    def __call__(
        self, spec: jnp.ndarray, flens: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """spec (B, T, C, F) complex → enhanced (B, T, F) complex."""
        mask_s, mask_n = self.mask_estimator(spec, flens)
        psd_s = psd_matrix(spec, mask_s, flens)
        psd_n = psd_matrix(spec, mask_n, flens)
        h = mvdr_filter(psd_s, psd_n, self.ref_channel)  # (B, F, C)
        enhanced = jnp.einsum("bfc,btcf->btf", jnp.conj(h), spec)
        return enhanced, flens, (mask_s, mask_n)


def wpe_dereverb(
    spec: jnp.ndarray,
    taps: int = 5,
    delay: int = 3,
    iterations: int = 1,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Weighted prediction error dereverberation (single- or multi-channel).

    spec: (B, T, C, F) complex. Per (batch, freq): solve the linear
    prediction filter on delayed frames weighted by inverse power, then
    subtract the predicted late reverberation. jnp.linalg.solve batches
    over (B, F).
    """
    b, t, c, f = spec.shape
    x = spec.transpose(0, 3, 1, 2)  # (B, F, T, C)

    def build_delayed(xf):
        # (B, F, T, C*taps): stack delayed copies
        frames = []
        for k in range(taps):
            shift = delay + k
            pad = jnp.zeros_like(xf[:, :, :shift])
            frames.append(jnp.concatenate([pad, xf[:, :, : t - shift]], axis=2))
        return jnp.concatenate(frames, axis=-1)

    y = x
    for _ in range(iterations):
        power = jnp.maximum((jnp.abs(y) ** 2).mean(axis=-1), eps)  # (B,F,T)
        w = 1.0 / power[..., None]
        xd = build_delayed(x)  # (B,F,T,CK)
        # normal equations: (Xd^H W Xd) G = Xd^H W X
        a = jnp.einsum("bfti,bftj->bfij", jnp.conj(xd) * w, xd)
        rhs = jnp.einsum("bfti,bftj->bfij", jnp.conj(xd) * w, x)
        ck = a.shape[-1]
        a = a + eps * jnp.eye(ck, dtype=a.dtype)
        g = jnp.linalg.solve(a, rhs)  # (B,F,CK,C)
        y = x - jnp.einsum("bfti,bfij->bftj", xd, g)
    return y.transpose(0, 2, 3, 1)  # (B, T, C, F)
