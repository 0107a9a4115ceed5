"""RNN-decoder attention variants (reference:
espnet/nets/pytorch_backend/rnn/attentions.py — NoAtt:46, AttDot:94,
AttAdd:171, AttLoc:250, AttCov:383, AttCovLoc:729, AttMultiHeadDot:845,
AttMultiHeadAdd:958, AttMultiHeadLoc:1075, AttForward:1388, factory
att_for:1661).

Common contract (shared with LocationAttention in rnn_decoder.py):
    pre_compute(enc_h) -> enc_proj              (cache W_e·h)
    init_state(batch, t, hlens, dtype) -> att_prev pytree
    __call__(enc_h, enc_proj, mask, dec_z, att_prev, scaling)
        -> (context (B, D), new_att_prev)
All are jit/scan friendly; state shapes are static.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask

MASK_MIN = -1.0e9


def _uniform_weights(batch, t, hlens, dtype):
    mask = make_non_pad_mask(hlens, t)
    return mask.astype(dtype) / jnp.maximum(hlens[:, None], 1).astype(dtype)


class NoAtt(nn.Module):
    """Uniform average context, no parameters (NoAtt:46)."""

    def pre_compute(self, enc_h):
        return enc_h

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        c = jnp.einsum("bt,btd->bd", att_prev, enc_h)
        return c, att_prev


class AttDot(nn.Module):
    """Dot-product attention (AttDot:94)."""

    att_dim: int = 320

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim)

    def pre_compute(self, enc_h):
        return jnp.tanh(self.mlp_enc(enc_h))

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        d = jnp.tanh(self.mlp_dec(dec_z))  # (B, A)
        e = jnp.einsum("bta,ba->bt", enc_proj, d)
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bt,btd->bd", w, enc_h), w


class AttAdd(nn.Module):
    """Additive (Bahdanau) attention (AttAdd:171)."""

    att_dim: int = 320

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        e = self.gvec(jnp.tanh(enc_proj + self.mlp_dec(dec_z)[:, None]))[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bt,btd->bd", w, enc_h), w


class AttCov(nn.Module):
    """Coverage attention: scores see the accumulated weights (AttCov:383).
    att_prev carries the RUNNING SUM of weights."""

    att_dim: int = 320

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.wvec = nn.Dense(self.att_dim)
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        cov = self.wvec(att_prev[..., None])  # (B, T, A)
        e = self.gvec(jnp.tanh(enc_proj + cov + self.mlp_dec(dec_z)[:, None]))[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bt,btd->bd", w, enc_h), att_prev + w


class AttCovLoc(nn.Module):
    """Coverage + location conv features (AttCovLoc:729); att_prev is the
    running sum fed through the location conv."""

    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(
            self.aconv_chans, (2 * self.aconv_filts + 1,), padding="SAME",
            use_bias=False,
        )
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        att_conv = self.mlp_att(self.loc_conv(att_prev[..., None]))
        e = self.gvec(
            jnp.tanh(enc_proj + att_conv + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bt,btd->bd", w, enc_h), att_prev + w


class AttMultiHeadDot(nn.Module):
    """Multi-head dot attention (AttMultiHeadDot:845)."""

    n_head: int = 4
    att_dim_k: int = 64

    def setup(self):
        self.mlp_k = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        self.mlp_v = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        self.mlp_q = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        self.mlp_o = nn.Dense(self.att_dim_k * self.n_head, use_bias=False)

    def pre_compute(self, enc_h):
        return (
            jnp.stack([jnp.tanh(m(enc_h)) for m in self.mlp_k], axis=1),  # (B,H,T,K)
            jnp.stack([m(enc_h) for m in self.mlp_v], axis=1),
        )

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        ks, vs = enc_proj
        q = jnp.stack([jnp.tanh(m(dec_z)) for m in self.mlp_q], axis=1)  # (B,H,K)
        e = jnp.einsum("bhtk,bhk->bht", ks, q)
        e = jnp.where(mask[:, None], e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask[:, None], w, 0.0)
        c = jnp.einsum("bht,bhtk->bhk", w, vs).reshape(dec_z.shape[0], -1)
        return self.mlp_o(c), w.mean(axis=1)


class AttForward(nn.Module):
    """Forward (monotonic) attention for TTS (AttForward:1388):
    alpha_t = ((1-u)·prev + u·shift(prev)) ⊙ softmax(score), renormed."""

    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100
    transition_prob: float = 0.5

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(
            self.aconv_chans, (2 * self.aconv_filts + 1,), padding="SAME",
            use_bias=False,
        )
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        # start focused on the first frame
        w = jnp.zeros((batch, t), dtype)
        return w.at[:, 0].set(1.0)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=1.0):
        att_conv = self.mlp_att(self.loc_conv(att_prev[..., None]))
        e = self.gvec(
            jnp.tanh(enc_proj + att_conv + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(e, axis=-1)
        shifted = jnp.pad(att_prev, ((0, 0), (1, 0)))[:, :-1]
        u = self.transition_prob
        alpha = ((1 - u) * att_prev + u * shifted + 1e-10) * w
        alpha = jnp.where(mask, alpha, 0.0)
        alpha = alpha / jnp.maximum(alpha.sum(axis=-1, keepdims=True), 1e-10)
        return jnp.einsum("bt,btd->bd", alpha, enc_h), alpha


def att_for(att_type: str, att_dim: int = 320, aconv_chans: int = 10,
            aconv_filts: int = 100, n_head: int = 4):
    """Factory (att_for:1661)."""
    from espnet_tpu.models.asr.rnn_decoder import LocationAttention

    if att_type == "noatt":
        return NoAtt()
    if att_type == "dot":
        return AttDot(att_dim)
    if att_type == "add":
        return AttAdd(att_dim)
    if att_type == "location":
        return LocationAttention(att_dim, aconv_chans, aconv_filts)
    if att_type == "coverage":
        return AttCov(att_dim)
    if att_type == "coverage_location":
        return AttCovLoc(att_dim, aconv_chans, aconv_filts)
    if att_type == "multi_head_dot":
        return AttMultiHeadDot(n_head, att_dim // n_head)
    if att_type == "forward":
        return AttForward(att_dim, aconv_chans, aconv_filts)
    raise ValueError(f"unknown attention type {att_type}")
