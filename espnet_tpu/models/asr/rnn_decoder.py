"""LSTM attention decoder with location-aware attention.

Capability parity with espnet/nets/pytorch_backend/rnn/decoders.py:29 and
rnn/attentions.py AttLoc:250. The per-output-step python loop of the
reference becomes an nn.scan over the label axis — one fused XLA while
loop, TPU-friendly. The same step function drives teacher-forced training
and (from the beam-search side) single-step scoring with explicit state.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask

MASK_MIN = -1.0e9


class LocationAttention(nn.Module):
    """AttLoc (attentions.py:250): score_t = g·tanh(We·h + Wd·z + Wf·conv(a_{t-1}))."""

    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(
            self.aconv_chans, (2 * self.aconv_filts + 1,), padding="SAME", use_bias=False
        )
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h: jnp.ndarray) -> jnp.ndarray:
        """Cache We·h once per utterance: (B, T, att_dim)."""
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        mask = make_non_pad_mask(hlens, t)
        return mask.astype(dtype) / jnp.maximum(hlens[:, None], 1).astype(dtype)

    def __call__(
        self,
        enc_h: jnp.ndarray,      # (B, T, D)
        enc_proj: jnp.ndarray,   # (B, T, att_dim) — pre_compute output
        mask: jnp.ndarray,       # (B, T) True at valid
        dec_z: jnp.ndarray,      # (B, dunits)
        att_prev: jnp.ndarray,   # (B, T)
        scaling: float = 2.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        att_conv = self.loc_conv(att_prev[..., None])  # (B, T, chans)
        att_conv = self.mlp_att(att_conv)
        dec = self.mlp_dec(dec_z)[:, None]  # (B, 1, att_dim)
        e = self.gvec(jnp.tanh(enc_proj + dec + att_conv))[..., 0]  # (B, T)
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        c = jnp.einsum("bt,btd->bd", w, enc_h)
        return c, w


class RNNDecoderStep(nn.Module):
    """One decoder step; scanned over the label axis by RNNDecoder."""

    vocab_size: int
    dunits: int
    dlayers: int
    att_dim: int
    aconv_chans: int
    aconv_filts: int
    dropout_rate: float
    att_type: str = "location"
    eprojs: int = 0  # encoder projection dim (multi-head context size)

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.dunits)
        if self.att_type == "location":
            self.att = LocationAttention(
                self.att_dim, self.aconv_chans, self.aconv_filts
            )
        else:
            from espnet_tpu.models.asr.attentions import att_for

            self.att = att_for(
                self.att_type, self.att_dim, self.aconv_chans, self.aconv_filts,
                eprojs=self.eprojs,
            )
        self.cells = [nn.LSTMCell(self.dunits) for _ in range(self.dlayers)]
        self.output = nn.Dense(self.vocab_size)
        self.dropout = nn.Dropout(self.dropout_rate)

    def init_state(self, batch: int, maxlen: int, hlens: jnp.ndarray, dtype=jnp.float32):
        states = tuple(
            (jnp.zeros((batch, self.dunits), dtype), jnp.zeros((batch, self.dunits), dtype))
            for _ in range(self.dlayers)
        )
        att_prev = self.att.init_state(batch, maxlen, hlens, dtype)
        return states, att_prev

    def __call__(self, carry, token, enc_h, enc_proj, mask, deterministic: bool = True):
        """carry = (lstm_states, att_prev); token (B,) int32 → logits (B, V)."""
        states, att_prev = carry
        emb = self.embed(token)
        att_c, att_w = self.att(enc_h, enc_proj, mask, states[0][1], att_prev)
        x = jnp.concatenate([emb, att_c], axis=-1)
        new_states = []
        for i, cell in enumerate(self.cells):
            (c, h) = states[i]
            (c, h), x = cell((c, h), x)
            x = self.dropout(x, deterministic=deterministic)
            new_states.append((c, h))
        logits = self.output(x)
        return (tuple(new_states), att_w), (logits, att_w)


class RNNDecoder(nn.Module):
    """Teacher-forced RNN attention decoder → (B, L, vocab) logits."""

    vocab_size: int
    dunits: int = 320
    dlayers: int = 1
    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100
    dropout_rate: float = 0.0
    att_type: str = "location"
    eprojs: int = 0
    # scheduled sampling (reference decoders.py:142-170): with this
    # probability feed the model's own previous argmax instead of the
    # teacher token during training. Drawn per (batch, step) from the
    # "sampling" rng stream; inference/beam paths are unaffected.
    sampling_probability: float = 0.0

    def setup(self):
        self.step = RNNDecoderStep(
            self.vocab_size,
            self.dunits,
            self.dlayers,
            self.att_dim,
            self.aconv_chans,
            self.aconv_filts,
            self.dropout_rate,
            self.att_type,
            self.eprojs,
        )

    def __call__(
        self,
        enc_h: jnp.ndarray,
        hlens: jnp.ndarray,
        ys_in: jnp.ndarray,  # (B, L) with sos prepended
        ys_in_lens: jnp.ndarray | None = None,  # unused; API parity w/ transformer
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l = ys_in.shape
        t = enc_h.shape[1]
        mask = make_non_pad_mask(hlens, t)
        enc_proj = self.step.att.pre_compute(enc_h)
        carry = self.step.init_state(b, t, hlens, enc_h.dtype)
        use_ss = self.sampling_probability > 0.0 and not deterministic

        if not use_ss:
            def body(mdl, carry, token):
                return mdl(carry, token, enc_h, enc_proj, mask, deterministic)

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1,
                out_axes=1,
            )
            _, (logits, att_ws) = scan(self.step, carry, ys_in)
            return logits

        # scheduled sampling: thread the previous step's argmax through
        # the carry; step 0's "previous prediction" is initialised to the
        # teacher sos so the draw is a no-op there (reference always
        # teacher-forces the first step)
        carry = (carry, ys_in[:, 0])

        def body_ss(mdl, carry, token):
            inner, prev_pred = carry
            coin = jax.random.bernoulli(
                mdl.make_rng("sampling"), self.sampling_probability, (token.shape[0],)
            )
            token_used = jnp.where(coin, prev_pred, token)
            new_inner, (logits, att_w) = mdl(
                inner, token_used, enc_h, enc_proj, mask, deterministic
            )
            return (new_inner, jnp.argmax(logits, axis=-1).astype(token.dtype)), (
                logits,
                att_w,
            )

        scan = nn.scan(
            body_ss,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "sampling": True},
            in_axes=1,
            out_axes=1,
        )
        _, (logits, att_ws) = scan(self.step, carry, ys_in)
        return logits

    def score_step(self, carry, token, enc_h, enc_proj, mask):
        """Single step for beam search (explicit state, deterministic)."""
        return self.step(carry, token, enc_h, enc_proj, mask, True)
