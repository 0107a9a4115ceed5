"""Voice conversion Tacotron2 (reference: espnet/nets/pytorch_backend/
e2e_vc_tacotron2.py:29): parallel spectrogram→spectrogram conversion —
the text-embedding encoder is replaced by a projection+conv+BLSTM encoder
over source acoustic features; decoder/postnet/losses are shared with
Tacotron2.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.tacotron2 import (
    Postnet,
    Tacotron2DecoderStep,
    guided_attention_loss,
    optax_bce,
)
from espnet_tpu.utils.masks import make_non_pad_mask


class VCEncoder(nn.Module):
    econv_chans: int = 512
    econv_layers: int = 3
    blstm_units: int = 512
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, ilens: jnp.ndarray, deterministic=True):
        x = nn.Dense(self.econv_chans)(x)
        for _ in range(self.econv_layers):
            x = nn.Conv(self.econv_chans, (5,), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=1)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        half = self.blstm_units // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half))(x, seq_lengths=ilens)
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True, keep_order=True)(
            x, seq_lengths=ilens
        )
        return jnp.concatenate([fwd, bwd], axis=-1)


class VCTacotron2(nn.Module):
    idim: int = 80           # source feature dim
    n_mels: int = 80         # target feature dim
    econv_chans: int = 64
    blstm_units: int = 64
    dunits: int = 256
    dlayers: int = 2
    prenet_units: int = 128
    postnet_chans: int = 128
    att_dim: int = 64
    aconv_chans: int = 8
    aconv_filts: int = 15
    reduction_factor: int = 1
    att_type: str = "location"
    use_guided_attn_loss: bool = True
    bce_pos_weight: float = 5.0

    def setup(self):
        self.enc = VCEncoder(self.econv_chans, 2, self.blstm_units)
        self.dec_step = Tacotron2DecoderStep(
            self.n_mels, self.reduction_factor, self.dunits, self.dlayers,
            self.prenet_units, self.att_dim, self.aconv_chans, self.aconv_filts,
            att_type=self.att_type,
        )
        self.postnet = Postnet(self.n_mels, self.postnet_chans, layers=3)

    def __call__(
        self,
        src_feats: jnp.ndarray,     # (B, Tsrc, idim)
        src_lengths: jnp.ndarray,
        speech: jnp.ndarray,         # (B, Tdec, n_mels) target feats
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        enc_h = self.enc(src_feats, src_lengths, deterministic)
        b, t_dec, _ = speech.shape
        r = self.reduction_factor
        steps = t_dec // r
        mask = make_non_pad_mask(src_lengths, enc_h.shape[1])
        enc_proj = self.dec_step.att.pre_compute(enc_h)
        states, att_prev, prev0 = self.dec_step.init_state(
            b, enc_h.shape[1], src_lengths, enc_h.dtype
        )
        ys_groups = speech.reshape(b, steps, r, self.n_mels)[:, :, -1]
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
        after = before + self.postnet(before, deterministic)

        fmask = make_non_pad_mask(speech_lengths, t_dec)[..., None]
        n_valid = jnp.maximum(fmask.sum(), 1) * self.n_mels
        l1_loss = ((jnp.abs(before - speech) + jnp.abs(after - speech)) * fmask).sum() / n_valid
        mse_loss = (((before - speech) ** 2 + (after - speech) ** 2) * fmask).sum() / n_valid
        pos = jnp.arange(t_dec)[None, :]
        stop_t = (pos >= (speech_lengths - 1)[:, None]).astype(jnp.float32)
        smask = make_non_pad_mask(speech_lengths, t_dec)
        bce_loss = (optax_bce(stop, stop_t, self.bce_pos_weight) * smask).sum() / jnp.maximum(smask.sum(), 1)
        loss = l1_loss + mse_loss + bce_loss
        stats = {"l1_loss": l1_loss, "mse_loss": mse_loss, "bce_loss": bce_loss}
        if self.use_guided_attn_loss:
            ga = guided_attention_loss(att_ws, src_lengths, speech_lengths // r)
            loss = loss + ga
            stats["attn_loss"] = ga
        stats["loss"] = loss
        return loss, stats

    def inference(
        self,
        src_feats: jnp.ndarray,      # (B, Tsrc, idim)
        src_lengths: jnp.ndarray,
        threshold: float = 0.5,
        maxlenratio: float = 3.0,
        minlenratio: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Autoregressive conversion → (feats (B, Tmax, n_mels), lengths,
        att_ws). Same scan-with-stop loop as Tacotron2.inference
        (reference e2e_vc_tacotron2.py inference path)."""
        b, t_src, _ = src_feats.shape
        r = self.reduction_factor
        maxsteps = max(int(maxlenratio * t_src) // r, 1)
        minsteps = int(minlenratio * t_src) // r
        enc_h = self.enc(src_feats, src_lengths, True)
        mask = make_non_pad_mask(src_lengths, t_src)
        enc_proj = self.dec_step.att.pre_compute(enc_h)
        states, att_prev, prev0 = self.dec_step.init_state(
            b, t_src, src_lengths, enc_h.dtype
        )

        def body(mdl, carry, _):
            (dec_carry, prev_frame, stopped, n_steps) = carry
            new_carry, (frames, stop, att_w) = mdl(
                dec_carry, prev_frame, enc_h, enc_proj, mask
            )
            frames_r = frames.reshape(b, r, self.n_mels)
            prob = jax.nn.sigmoid(stop).max(axis=1)
            n_steps = n_steps + 1
            newly_stopped = (prob >= threshold) & (n_steps >= max(minsteps, 1))
            keep = ~stopped
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
        init = (
            (states, att_prev),
            prev0,
            jnp.zeros((b,), bool),
            jnp.zeros((b,), jnp.int32),
        )
        _, (frames, att_ws, stopped_hist) = scan(self.dec_step, init, None)
        frames = jnp.transpose(frames, (1, 0, 2, 3)).reshape(
            b, maxsteps * r, self.n_mels
        )
        post = frames + self.postnet(frames, True)
        stopped_hist = jnp.transpose(stopped_hist)
        olens = (~stopped_hist).sum(axis=1) * r
        att_ws = jnp.transpose(att_ws, (1, 0, 2))
        return post, olens, att_ws
