"""Tacotron2 TTS (reference: espnet/nets/pytorch_backend/e2e_tts_tacotron2.py
Tacotron2:273, tacotron2/{encoder.py:23, decoder.py}; espnet2/tts/tacotron2.py:28).

Text → embed → 3×conv + BLSTM encoder → location-attention LSTM decoder
(prenet input, reduction factor r, stop-token head) → postnet residual.
The per-frame python loop of the reference is an nn.scan (training,
teacher-forced) / bounded lax.while-style masked scan (inference).

Loss = L1 + MSE on before/after-postnet + BCE(stop, pos-weighted) +
guided-attention loss (Tacotron2Loss:166, GuidedAttentionLoss:25).
Prenet dropout stays ACTIVE at inference (reference decoder.py:134).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr.rnn_decoder import LocationAttention
from espnet_tpu.utils.masks import make_non_pad_mask


def guided_attention_loss(
    att_ws: jnp.ndarray,  # (B, Tdec, Tenc)
    ilens: jnp.ndarray,   # (B,) encoder lengths
    olens: jnp.ndarray,   # (B,) decoder lengths
    sigma: float = 0.4,
) -> jnp.ndarray:
    b, t_dec, t_enc = att_ws.shape
    l_pos = jnp.arange(t_enc)[None, None, :] / jnp.maximum(ilens, 1)[:, None, None]
    t_pos = jnp.arange(t_dec)[None, :, None] / jnp.maximum(olens, 1)[:, None, None]
    w = 1.0 - jnp.exp(-((l_pos - t_pos) ** 2) / (2 * sigma**2))
    mask = (
        make_non_pad_mask(olens, t_dec)[:, :, None]
        & make_non_pad_mask(ilens, t_enc)[:, None, :]
    )
    return jnp.sum(att_ws * w * mask) / jnp.maximum(mask.sum(), 1)


class Prenet(nn.Module):
    units: int = 256
    layers: int = 2
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # dropout is ALWAYS active (reference behaviour)
        for _ in range(self.layers):
            x = nn.relu(nn.Dense(self.units)(x))
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return x


class Postnet(nn.Module):
    n_mels: int
    channels: int = 512
    layers: int = 5
    kernel: int = 5
    dropout_rate: float = 0.5
    # "group" (default, batch-stat-free) or "batch": the reference's
    # BatchNorm1d layout (tacotron2/decoder.py:189-231 — norm on EVERY
    # layer incl. the last, tanh on all but the last). "batch" exists for
    # reference-compatible numerics; training with it requires the caller
    # to carry the flax batch_stats collection.
    norm_type: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.layers):
            last = i == self.layers - 1
            ch = self.n_mels if last else self.channels
            x = nn.Conv(ch, (self.kernel,), padding="SAME")(x)
            if self.norm_type == "batch":
                x = nn.BatchNorm(use_running_average=deterministic)(x)
                if not last:
                    x = jnp.tanh(x)
            elif not last:
                x = nn.GroupNorm(num_groups=1)(x)
                x = jnp.tanh(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class TacotronEncoder(nn.Module):
    vocab_size: int
    embed_dim: int = 512
    conv_layers: int = 3
    conv_chans: int = 512
    conv_kernel: int = 5
    blstm_units: int = 512
    dropout_rate: float = 0.5
    norm_type: str = "group"  # "batch" = reference BatchNorm1d layout

    @nn.compact
    def __call__(self, text: jnp.ndarray, ilens: jnp.ndarray, deterministic=True):
        x = nn.Embed(self.vocab_size, self.embed_dim)(text)
        for _ in range(self.conv_layers):
            x = nn.Conv(self.conv_chans, (self.conv_kernel,), padding="SAME")(x)
            if self.norm_type == "batch":
                x = nn.BatchNorm(use_running_average=deterministic)(x)
            else:
                x = nn.GroupNorm(num_groups=1)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        half = self.blstm_units // 2
        # param_dtype follows the activations so the scan carry keeps the
        # caller's precision (x64 parity runs); f32 training is unchanged
        fwd = nn.RNN(nn.OptimizedLSTMCell(half, param_dtype=x.dtype))(
            x, seq_lengths=ilens
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(half, param_dtype=x.dtype),
            reverse=True,
            keep_order=True,
        )(x, seq_lengths=ilens)
        return jnp.concatenate([fwd, bwd], axis=-1)


class Tacotron2DecoderStep(nn.Module):
    n_mels: int
    reduction_factor: int
    dunits: int = 1024
    dlayers: int = 2
    prenet_units: int = 256
    att_dim: int = 128
    aconv_chans: int = 32
    aconv_filts: int = 15
    cumulate_att_w: bool = True
    att_type: str = "location"  # location | forward | forward_ta
    # (reference Tacotron2 default atype is forward_ta,
    #  e2e_tts_tacotron2.py:378 — selectable here via tts_conf.att_type)
    prenet_dropout_rate: float = 0.5

    def setup(self):
        if self.att_type == "location":
            self.att = LocationAttention(
                self.att_dim, self.aconv_chans, self.aconv_filts
            )
        elif self.att_type == "forward":
            from espnet_tpu.models.asr.attentions import AttForward

            self.att = AttForward(self.att_dim, self.aconv_chans, self.aconv_filts)
        elif self.att_type == "forward_ta":
            from espnet_tpu.models.asr.attentions import AttForwardTA

            self.att = AttForwardTA(self.att_dim, self.aconv_chans, self.aconv_filts)
        else:
            raise ValueError(f"unknown tacotron att_type {self.att_type}")
        self.prenet = Prenet(
            self.prenet_units, dropout_rate=self.prenet_dropout_rate
        )
        self.cells = [nn.LSTMCell(self.dunits) for _ in range(self.dlayers)]
        self.feat_out = nn.Dense(self.n_mels * self.reduction_factor, use_bias=False)
        self.prob_out = nn.Dense(self.reduction_factor)

    def init_state(self, batch: int, maxlen: int, hlens: jnp.ndarray, dtype=jnp.float32):
        states = tuple(
            (jnp.zeros((batch, self.dunits), dtype), jnp.zeros((batch, self.dunits), dtype))
            for _ in range(self.dlayers)
        )
        if self.att_type == "location":
            # zeros = "step 0" sentinel; __call__ substitutes the uniform
            # prior for the attention input without polluting the
            # cumulative sum (reference decoder.py first-step semantics)
            att_prev = jnp.zeros((batch, maxlen), dtype)
        else:
            att_prev = self.att.init_state(batch, maxlen, hlens, dtype)
        prev_frame = jnp.zeros((batch, self.n_mels), dtype)
        return states, att_prev, prev_frame

    def __call__(self, carry, prev_frame, enc_h, enc_proj, mask):
        """One decoder step. carry=(lstm_states, att_state); returns
        (new_carry, (frames (B, r*n_mels), stop_logits (B, r), att_w))."""
        states, att_state = carry
        dec_z = states[0][1]
        if self.att_type == "location":
            # step 0 is marked by an all-zero cumulative state: the
            # uniform prior feeds the attention but is NOT part of the
            # cumulative sum (reference decoder.py: "prev_att_w = att_w
            # if prev_att_w is None else prev_att_w + att_w")
            first = jnp.sum(jnp.abs(att_state), axis=-1, keepdims=True) == 0
            uniform = mask.astype(att_state.dtype) / jnp.maximum(
                mask.sum(axis=-1, keepdims=True), 1
            ).astype(att_state.dtype)
            att_in = jnp.where(first, uniform, att_state)
            # reference AttLoc default scaling is 2.0 (attentions.py:125;
            # the forward/forward_ta variants default to 1.0)
            att_c, att_w = self.att(
                enc_h, enc_proj, mask, dec_z, att_in, scaling=2.0
            )
            if self.cumulate_att_w:
                new_att = jnp.where(first, att_w, att_state + att_w)
            else:
                new_att = att_w
        elif self.att_type == "forward":
            att_c, new_att = self.att(
                enc_h, enc_proj, mask, dec_z, att_state, scaling=1.0
            )
            att_w = new_att
        else:  # forward_ta: transition agent sees the previous frame
            att_c, new_att = self.att(
                enc_h, enc_proj, mask, dec_z, att_state,
                scaling=1.0, out_prev=prev_frame,
            )
            att_w = new_att[0]
        pre = self.prenet(prev_frame)
        x = jnp.concatenate([pre, att_c], axis=-1)
        new_states = []
        for i, cell in enumerate(self.cells):
            (c, h) = states[i]
            (c, h), x = cell((c, h), x)
            new_states.append((c, h))
        cat = jnp.concatenate([x, att_c], axis=-1)
        frames = self.feat_out(cat)
        stop = self.prob_out(cat)
        return (tuple(new_states), new_att), (frames, stop, att_w)


class Tacotron2(nn.Module):
    vocab_size: int
    n_mels: int = 80
    embed_dim: int = 512
    enc_conv_layers: int = 3
    enc_conv_chans: int = 512
    enc_blstm_units: int = 512
    dunits: int = 1024
    dlayers: int = 2
    prenet_units: int = 256
    postnet_chans: int = 512
    postnet_layers: int = 5
    att_dim: int = 128
    aconv_chans: int = 32
    aconv_filts: int = 15
    reduction_factor: int = 1
    spk_embed_dim: int = 0   # >0: x-vector conditioning (spemb concat)
    use_cbhg: bool = False   # CBHG post-module → linear spectrogram
    spc_dim: int = 0         # linear-spectrogram bins (use_cbhg)
    att_type: str = "location"  # location | forward | forward_ta
    use_guided_attn_loss: bool = True
    guided_attn_sigma: float = 0.4
    guided_attn_lambda: float = 1.0
    bce_pos_weight: float = 5.0
    dropout_rate: float = 0.5
    prenet_dropout_rate: float = 0.5
    norm_type: str = "group"  # "batch" = reference BatchNorm1d numerics

    def setup(self):
        self.enc = TacotronEncoder(
            self.vocab_size,
            self.embed_dim,
            self.enc_conv_layers,
            self.enc_conv_chans,
            5,
            self.enc_blstm_units,
            self.dropout_rate,
            norm_type=self.norm_type,
        )
        self.dec_step = Tacotron2DecoderStep(
            self.n_mels,
            self.reduction_factor,
            self.dunits,
            self.dlayers,
            self.prenet_units,
            self.att_dim,
            self.aconv_chans,
            self.aconv_filts,
            att_type=self.att_type,
            prenet_dropout_rate=self.prenet_dropout_rate,
        )
        self.postnet = Postnet(
            self.n_mels,
            self.postnet_chans,
            layers=self.postnet_layers,
            norm_type=self.norm_type,
        )
        if self.spk_embed_dim > 0:
            self.spemb_proj = nn.Dense(self.embed_dim)
        if self.use_cbhg:
            from espnet_tpu.layers.tacotron_extras import CBHG

            self.cbhg = CBHG(out_dim=self.spc_dim)

    def _condition(self, enc_h, spemb):
        """Concat a projected speaker embedding to every encoder frame
        (reference spk_embed integration, e2e_tts_tacotron2.py)."""
        if self.spk_embed_dim == 0 or spemb is None:
            return enc_h
        emb = nn.tanh(self.spemb_proj(spemb))[:, None, :]
        return jnp.concatenate(
            [enc_h, jnp.broadcast_to(emb, (enc_h.shape[0], enc_h.shape[1], emb.shape[-1]))],
            axis=-1,
        )

    def _decode_teacher(self, enc_h, hlens, ys, deterministic):
        """ys: (B, Tdec, n_mels) ground-truth frames (Tdec divisible by r)."""
        b, t_dec, _ = ys.shape
        r = self.reduction_factor
        steps = t_dec // r
        mask = make_non_pad_mask(hlens, enc_h.shape[1])
        enc_proj = self.dec_step.att.pre_compute(enc_h)
        states, att_prev, prev0 = self.dec_step.init_state(
            b, enc_h.shape[1], hlens, enc_h.dtype
        )
        # teacher inputs: last frame of each previous group
        ys_groups = ys.reshape(b, steps, r, self.n_mels)[:, :, -1]  # (B, steps, n_mels)
        teacher = jnp.concatenate([prev0[:, None], ys_groups[:, :-1]], axis=1)

        def body(mdl, carry, prev):
            return mdl(carry, prev, enc_h, enc_proj, mask)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, (frames, stop, att_ws) = scan(self.dec_step, (states, att_prev), teacher)
        before = frames.reshape(b, steps * r, self.n_mels)
        stop = stop.reshape(b, steps * r)
        return before, stop, att_ws

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,        # (B, Tdec, n_mels) target feats
        speech_lengths: jnp.ndarray,
        spembs: jnp.ndarray = None,  # (B, spk_embed_dim) x-vectors
        spc: jnp.ndarray = None,     # (B, Tdec, spc_dim) linear-spec target
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        enc_h = self.enc(text, text_lengths, deterministic)
        enc_h = self._condition(enc_h, spembs)
        before, stop_logits, att_ws = self._decode_teacher(
            enc_h, text_lengths, speech, deterministic
        )
        after = before + self.postnet(before, deterministic)

        t_dec = speech.shape[1]
        mask = make_non_pad_mask(speech_lengths, t_dec)[..., None]
        n_valid = jnp.maximum(mask.sum(), 1) * self.n_mels

        l1 = (jnp.abs(before - speech) + jnp.abs(after - speech)) * mask
        mse = ((before - speech) ** 2 + (after - speech) ** 2) * mask
        l1_loss = l1.sum() / n_valid
        mse_loss = mse.sum() / n_valid

        # stop labels: 1 at the last valid frame onwards
        pos = jnp.arange(t_dec)[None, :]
        stop_target = (pos >= (speech_lengths - 1)[:, None]).astype(jnp.float32)
        stop_mask = make_non_pad_mask(speech_lengths, t_dec)
        bce = optax_bce(stop_logits, stop_target, self.bce_pos_weight)
        bce_loss = (bce * stop_mask).sum() / jnp.maximum(stop_mask.sum(), 1)

        loss = l1_loss + mse_loss + bce_loss
        stats = {
            "l1_loss": l1_loss,
            "mse_loss": mse_loss,
            "bce_loss": bce_loss,
        }
        if self.use_guided_attn_loss:
            ga = guided_attention_loss(
                att_ws, text_lengths, speech_lengths // self.reduction_factor,
                self.guided_attn_sigma,
            )
            loss = loss + self.guided_attn_lambda * ga
            stats["attn_loss"] = ga
        if self.use_cbhg and spc is not None:
            spc_pred = self.cbhg(after, speech_lengths, deterministic)
            cmask = make_non_pad_mask(speech_lengths, t_dec)[..., None]
            n_spc = jnp.maximum(cmask.sum(), 1) * self.spc_dim
            cbhg_loss = (
                (jnp.abs(spc_pred - spc) + (spc_pred - spc) ** 2) * cmask
            ).sum() / n_spc
            loss = loss + cbhg_loss
            stats["cbhg_loss"] = cbhg_loss
        stats["loss"] = loss
        return loss, stats

    def inference(
        self,
        text: jnp.ndarray,           # (B, L)
        text_lengths: jnp.ndarray,
        threshold: float = 0.5,
        maxlenratio: float = 10.0,
        minlenratio: float = 0.0,
        spembs: jnp.ndarray = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Autoregressive synthesis → (feats (B, Tmax, n_mels), lengths,
        att_ws). Static Tmax = maxlenratio * L; stop via threshold."""
        b, l = text.shape
        r = self.reduction_factor
        maxsteps = max(int(maxlenratio * l) // r, 1)
        minsteps = int(minlenratio * l) // r
        enc_h = self.enc(text, text_lengths, True)
        enc_h = self._condition(enc_h, spembs)
        mask = make_non_pad_mask(text_lengths, l)
        enc_proj = self.dec_step.att.pre_compute(enc_h)
        states, att_prev, prev0 = self.dec_step.init_state(b, l, text_lengths, enc_h.dtype)

        def body(mdl, carry, _):
            (dec_carry, prev_frame, stopped, n_steps) = carry
            new_carry, (frames, stop, att_w) = mdl(
                dec_carry, prev_frame, enc_h, enc_proj, mask
            )
            frames_r = frames.reshape(b, r, self.n_mels)
            prob = jax.nn.sigmoid(stop).max(axis=1)  # (B,)
            n_steps = n_steps + 1
            newly_stopped = (prob >= threshold) & (n_steps >= max(minsteps, 1))
            keep = ~stopped
            # frozen once stopped
            out_frames = jnp.where(keep[:, None, None], frames_r, 0.0)
            dec_carry = jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    keep.reshape((b,) + (1,) * (n.ndim - 1)), n, o
                ),
                new_carry,
                carry[0],
            )
            stopped = stopped | newly_stopped
            return (dec_carry, frames_r[:, -1], stopped, n_steps), (
                out_frames,
                att_w,
                stopped,
            )

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=maxsteps,
        )
        init = (states, att_prev), prev0, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32)
        _, (frames, att_ws, stopped_hist) = scan(self.dec_step, init, None)
        # frames: (steps, B, r, n_mels) → (B, steps*r, n_mels)
        frames = jnp.transpose(frames, (1, 0, 2, 3)).reshape(b, maxsteps * r, self.n_mels)
        post = frames + self.postnet(frames, True)
        # lengths: first step where stopped
        stopped_hist = jnp.transpose(stopped_hist)  # (B, steps)
        olens = (~stopped_hist).sum(axis=1) * r
        att_ws = jnp.transpose(att_ws, (1, 0, 2))
        return post, olens, att_ws


def optax_bce(logits, targets, pos_weight: float = 1.0):
    """Elementwise weighted BCE-with-logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)
