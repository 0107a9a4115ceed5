"""RNN-decoder attention variants — the complete 14-variant library
(reference: espnet/nets/pytorch_backend/rnn/attentions.py — NoAtt:46,
AttDot:94, AttAdd:171, AttLoc:250, AttCov:383, AttLoc2D:485,
AttLocRec:606, AttCovLoc:729, AttMultiHeadDot:845, AttMultiHeadAdd:958,
AttMultiHeadLoc:1075, AttMultiHeadMultiResLoc:1232, AttForward:1388,
AttForwardTA:1518, factory att_for:1661).

Common contract (shared with LocationAttention in rnn_decoder.py):
    pre_compute(enc_h) -> enc_proj              (cache W_e·h)
    init_state(batch, t, hlens, dtype) -> att_prev pytree
    __call__(enc_h, enc_proj, mask, dec_z, att_prev, scaling)
        -> (context (B, D), new_att_prev)
All are jit/scan friendly; state shapes are static. AttForwardTA
additionally consumes ``out_prev`` (the previous output frame) and
threads its transition-agent probability through the state pytree.
"""
from __future__ import annotations


import flax.linen as nn
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
    """Multi-head dot attention (AttMultiHeadDot:845): k/v projections are
    bias-free, softmax scaling is the FIXED 1/sqrt(att_dim_k) (the passed
    ``scaling`` is ignored, matching the reference which does not take the
    argument), and the output projection maps to ``eprojs`` (the encoder
    projection dim; 0 → att_dim_v·n_head for legacy configs)."""

    n_head: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    eprojs: int = 0

    def setup(self):
        self.mlp_k = [nn.Dense(self.att_dim_k, use_bias=False) for _ in range(self.n_head)]
        self.mlp_v = [nn.Dense(self.att_dim_v, use_bias=False) for _ in range(self.n_head)]
        self.mlp_q = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        out = self.eprojs or self.att_dim_v * self.n_head
        self.mlp_o = nn.Dense(out, use_bias=False)

    def pre_compute(self, enc_h):
        return (
            jnp.stack([jnp.tanh(m(enc_h)) for m in self.mlp_k], axis=1),  # (B,H,T,K)
            jnp.stack([m(enc_h) for m in self.mlp_v], axis=1),
        )

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        ks, vs = enc_proj
        del scaling  # reference AttMultiHeadDot hardcodes 1/sqrt(d_k)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.att_dim_k, jnp.float32))
        q = jnp.stack([jnp.tanh(m(dec_z)) for m in self.mlp_q], axis=1)  # (B,H,K)
        e = jnp.einsum("bhtk,bhk->bht", ks, q)
        e = jnp.where(mask[:, None], e, MASK_MIN)
        w = nn.softmax(scale * e, axis=-1)
        w = jnp.where(mask[:, None], w, 0.0)
        c = jnp.einsum("bht,bhtv->bhv", w, vs).reshape(dec_z.shape[0], -1)
        return self.mlp_o(c), w.mean(axis=1)


class AttForward(nn.Module):
    """Forward (monotonic) attention for TTS (AttForward:1388):
    alpha_t = (prev + shift(prev)) ⊙ softmax(score), clamped at 1e-6 and
    L1-renormalized (the fixed-weight sum, NOT a transition-prob mix —
    only AttForwardTA has a transition agent). Padded frames are zeroed
    here where the reference leaves clamp-floor 1e-6 mass on them."""

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
        # start focused on the first frame
        w = jnp.zeros((batch, t), dtype)
        return w.at[:, 0].set(1.0)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=1.0):
        att_conv = self.mlp_att(self.loc_conv(att_prev[..., None]))
        e = self.gvec(
            jnp.tanh(enc_proj + att_conv + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        shifted = jnp.pad(att_prev, ((0, 0), (1, 0)))[:, :-1]
        alpha = (att_prev + shifted) * w
        # clamp before normalizing (reference: avoids nan gradients)
        alpha = jnp.where(mask, jnp.maximum(alpha, 1e-6), 0.0)
        alpha = alpha / jnp.maximum(alpha.sum(axis=-1, keepdims=True), 1e-10)
        return jnp.einsum("bt,btd->bd", alpha, enc_h), alpha


class AttLoc2D(nn.Module):
    """2D location attention (AttLoc2D:485): the conv sees the last
    `att_win` attention-weight frames, not just one. State: (B, W, T)."""

    att_dim: int = 320
    att_win: int = 5
    aconv_chans: int = 10
    aconv_filts: int = 100

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        # (W, 2F+1) kernel, valid over the window axis → one output row
        self.loc_conv = nn.Conv(
            self.aconv_chans,
            (self.att_win, 2 * self.aconv_filts + 1),
            padding=((0, 0), (self.aconv_filts, self.aconv_filts)),
            use_bias=False,
        )
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        w = _uniform_weights(batch, t, hlens, dtype)
        return jnp.tile(w[:, None], (1, self.att_win, 1))

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        # (B, W, T, 1) → (B, 1, T, C) → (B, T, C)
        att_conv = self.loc_conv(att_prev[..., None])[:, 0]
        att_conv = self.mlp_att(att_conv)
        e = self.gvec(
            jnp.tanh(enc_proj + att_conv + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        c = jnp.einsum("bt,btd->bd", w, enc_h)
        new_prev = jnp.concatenate([att_prev[:, 1:], w[:, None]], axis=1)
        return c, new_prev


class AttLocRec(nn.Module):
    """Recurrent location attention (AttLocRec:606): an LSTM accumulates
    the history of (max-pooled) attention conv features; its hidden state
    is the additive bias. State: (w, (lstm_c, lstm_h))."""

    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(
            self.aconv_chans, (2 * self.aconv_filts + 1,), padding="SAME",
            use_bias=False,
        )
        self.att_lstm = nn.LSTMCell(self.att_dim)
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        w = _uniform_weights(batch, t, hlens, dtype)
        zeros = jnp.zeros((batch, self.att_dim), dtype)
        return (w, (zeros, zeros))

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        w_prev, lstm_state = att_prev
        att_conv = nn.relu(self.loc_conv(w_prev[..., None]))  # (B, T, C)
        pooled = att_conv.max(axis=1)  # (B, C), max-pool over time
        lstm_state, att_h = self.att_lstm(lstm_state, pooled)
        e = self.gvec(
            jnp.tanh(enc_proj + att_h[:, None] + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bt,btd->bd", w, enc_h), (w, lstm_state)


class AttMultiHeadAdd(nn.Module):
    """Multi-head additive attention (AttMultiHeadAdd:958); fixed
    1/sqrt(d_k) scaling per the reference."""

    n_head: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    eprojs: int = 0  # output dim (encoder projection); 0 → att_dim_v·n_head

    def setup(self):
        self.mlp_k = [nn.Dense(self.att_dim_k, use_bias=False) for _ in range(self.n_head)]
        self.mlp_v = [nn.Dense(self.att_dim_v, use_bias=False) for _ in range(self.n_head)]
        self.mlp_q = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        self.gvec = [nn.Dense(1) for _ in range(self.n_head)]
        self.mlp_o = nn.Dense(self.eprojs or self.att_dim_v * self.n_head, use_bias=False)

    def pre_compute(self, enc_h):
        return (
            jnp.stack([m(enc_h) for m in self.mlp_k], axis=1),  # (B,H,T,K)
            jnp.stack([m(enc_h) for m in self.mlp_v], axis=1),  # (B,H,T,V)
        )

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        return _uniform_weights(batch, t, hlens, dtype)

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        ks, vs = enc_proj
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.att_dim_k, jnp.float32))
        ws = []
        cs = []
        for h in range(self.n_head):
            e = self.gvec[h](
                jnp.tanh(ks[:, h] + self.mlp_q[h](dec_z)[:, None])
            )[..., 0]
            e = jnp.where(mask, e, MASK_MIN)
            w = nn.softmax(scale * e, axis=-1)
            w = jnp.where(mask, w, 0.0)
            ws.append(w)
            cs.append(jnp.einsum("bt,btv->bv", w, vs[:, h]))
        c = self.mlp_o(jnp.concatenate(cs, axis=-1))
        return c, jnp.stack(ws, axis=1).mean(axis=1)


class _MultiHeadLocBase(nn.Module):
    """Shared multi-head location machinery (AttMultiHeadLoc:1075 /
    AttMultiHeadMultiResLoc:1232 — the latter varies the filter size per
    head). State: per-head weights (B, H, T)."""

    n_head: int = 4
    att_dim_k: int = 64
    att_dim_v: int = 64
    aconv_chans: int = 10
    aconv_filts: int = 100
    multi_res: bool = False
    eprojs: int = 0  # output dim (encoder projection); 0 → att_dim_v·n_head

    def setup(self):
        self.mlp_k = [nn.Dense(self.att_dim_k, use_bias=False) for _ in range(self.n_head)]
        self.mlp_v = [nn.Dense(self.att_dim_v, use_bias=False) for _ in range(self.n_head)]
        self.mlp_q = [nn.Dense(self.att_dim_k) for _ in range(self.n_head)]
        self.mlp_att = [nn.Dense(self.att_dim_k, use_bias=False) for _ in range(self.n_head)]
        convs = []
        for h in range(self.n_head):
            # multi-res: per-head filter = aconv_filts·(h+1)//n_head
            # (attentions.py:1277 — may be 0 → width-1 kernel)
            filts = (
                self.aconv_filts * (h + 1) // self.n_head
                if self.multi_res
                else self.aconv_filts
            )
            convs.append(
                nn.Conv(
                    self.aconv_chans, (2 * filts + 1,), padding="SAME",
                    use_bias=False,
                )
            )
        self.loc_conv = convs
        self.gvec = [nn.Dense(1) for _ in range(self.n_head)]
        self.mlp_o = nn.Dense(self.eprojs or self.att_dim_v * self.n_head, use_bias=False)

    def pre_compute(self, enc_h):
        return (
            jnp.stack([m(enc_h) for m in self.mlp_k], axis=1),
            jnp.stack([m(enc_h) for m in self.mlp_v], axis=1),
        )

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        w = _uniform_weights(batch, t, hlens, dtype)
        return jnp.tile(w[:, None], (1, self.n_head, 1))

    def __call__(self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=2.0):
        ks, vs = enc_proj
        if self.multi_res:
            # reference quirk: AttMultiHeadMultiResLoc hardcodes
            # 1/sqrt(d_k) (attentions.py:1371) while AttMultiHeadLoc
            # takes the scaling argument (default 2.0, :1148)
            scaling = 1.0 / jnp.sqrt(jnp.asarray(self.att_dim_k, jnp.float32))
        ws = []
        cs = []
        for h in range(self.n_head):
            att_conv = self.mlp_att[h](self.loc_conv[h](att_prev[:, h][..., None]))
            e = self.gvec[h](
                jnp.tanh(ks[:, h] + att_conv + self.mlp_q[h](dec_z)[:, None])
            )[..., 0]
            e = jnp.where(mask, e, MASK_MIN)
            w = nn.softmax(scaling * e, axis=-1)
            w = jnp.where(mask, w, 0.0)
            ws.append(w)
            cs.append(jnp.einsum("bt,btv->bv", w, vs[:, h]))
        c = self.mlp_o(jnp.concatenate(cs, axis=-1))
        return c, jnp.stack(ws, axis=1)


class AttMultiHeadLoc(_MultiHeadLocBase):
    multi_res: bool = False


class AttMultiHeadMultiResLoc(_MultiHeadLocBase):
    multi_res: bool = True


class AttForwardTA(nn.Module):
    """Forward attention with transition agent (AttForwardTA:1518,
    the reference Tacotron2 default `forward_ta`,
    e2e_tts_tacotron2.py:378): alpha = (p·prev + (1-p)·shift(prev))⊙w,
    with p = sigmoid(W[c; out_prev; dec_z]) updated AFTER each step.
    State: (alpha (B,T), trans_prob (B,1))."""

    att_dim: int = 320
    aconv_chans: int = 10
    aconv_filts: int = 100

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_ta = nn.Dense(1)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(
            self.aconv_chans, (2 * self.aconv_filts + 1,), padding="SAME",
            use_bias=False,
        )
        self.gvec = nn.Dense(1)

    def pre_compute(self, enc_h):
        return self.mlp_enc(enc_h)

    def init_state(self, batch, t, hlens, dtype=jnp.float32):
        alpha = jnp.zeros((batch, t), dtype).at[:, 0].set(1.0)
        trans_prob = jnp.full((batch, 1), 0.5, dtype)
        return (alpha, trans_prob)

    def __call__(
        self, enc_h, enc_proj, mask, dec_z, att_prev, scaling=1.0, out_prev=None
    ):
        alpha_prev, trans_prob = att_prev
        att_conv = self.mlp_att(self.loc_conv(alpha_prev[..., None]))
        e = self.gvec(
            jnp.tanh(enc_proj + att_conv + self.mlp_dec(dec_z)[:, None])
        )[..., 0]
        e = jnp.where(mask, e, MASK_MIN)
        w = nn.softmax(scaling * e, axis=-1)
        shifted = jnp.pad(alpha_prev, ((0, 0), (1, 0)))[:, :-1]
        alpha = (trans_prob * alpha_prev + (1.0 - trans_prob) * shifted) * w
        # clamp before normalizing (reference: avoids nan gradients)
        alpha = jnp.where(mask, jnp.maximum(alpha, 1e-6), 0.0)
        alpha = alpha / jnp.maximum(alpha.sum(axis=-1, keepdims=True), 1e-10)
        c = jnp.einsum("bt,btd->bd", alpha, enc_h)
        if out_prev is None:
            out_prev = jnp.zeros((dec_z.shape[0], 0), dec_z.dtype)
        new_prob = nn.sigmoid(
            self.mlp_ta(jnp.concatenate([c, out_prev, dec_z], axis=-1))
        )
        return c, (alpha, new_prob)


def att_for(att_type: str, att_dim: int = 320, aconv_chans: int = 10,
            aconv_filts: int = 100, n_head: int = 4, att_win: int = 5,
            eprojs: int = 0):
    """Factory covering all 14 reference variants (initial_att:1726).

    Multi-head variants follow the reference convention: att_dim_k =
    att_dim_v = att_dim per head (initial_att:1760 passes adim for both),
    output projected to ``eprojs`` (0 → att_dim_v·n_head legacy)."""
    from espnet_tpu.models.asr.rnn_decoder import LocationAttention

    if att_type == "noatt":
        return NoAtt()
    if att_type == "dot":
        return AttDot(att_dim)
    if att_type == "add":
        return AttAdd(att_dim)
    if att_type == "location":
        return LocationAttention(att_dim, aconv_chans, aconv_filts)
    if att_type == "location2d":
        return AttLoc2D(att_dim, att_win, aconv_chans, aconv_filts)
    if att_type == "location_recurrent":
        return AttLocRec(att_dim, aconv_chans, aconv_filts)
    if att_type == "coverage":
        return AttCov(att_dim)
    if att_type == "coverage_location":
        return AttCovLoc(att_dim, aconv_chans, aconv_filts)
    if att_type == "multi_head_dot":
        return AttMultiHeadDot(n_head, att_dim, att_dim, eprojs)
    if att_type == "multi_head_add":
        return AttMultiHeadAdd(n_head, att_dim, att_dim, eprojs)
    if att_type == "multi_head_loc":
        return AttMultiHeadLoc(
            n_head, att_dim, att_dim, aconv_chans, aconv_filts, eprojs=eprojs
        )
    if att_type == "multi_head_multi_res_loc":
        return AttMultiHeadMultiResLoc(
            n_head, att_dim, att_dim, aconv_chans, aconv_filts, eprojs=eprojs
        )
    if att_type == "forward":
        return AttForward(att_dim, aconv_chans, aconv_filts)
    if att_type == "forward_ta":
        return AttForwardTA(att_dim, aconv_chans, aconv_filts)
    raise ValueError(f"unknown attention type {att_type}")
