"""Voice Transformer Network — Transformer-based parallel VC (reference:
espnet/nets/pytorch_backend/e2e_vc_transformer.py:34, "Voice Conversion
Using Transformer with TTS pretraining").

Same encoder-decoder transformer as TransformerTTS, but the text
embedding is replaced by a continuous-feature input layer over source
acoustic frames: ``encoder_reduction_factor`` consecutive frames are
stacked and linearly projected (reference :515 — linear input over
idim × encoder_reduction_factor), which shortens the encoder sequence the
way the reference "thins out" input frames (:658-667). Decoder prenet,
scaled positional encodings, stop-token head, postnet and the
L1+MSE+BCE loss family are shared with TransformerTTS.

Exposes the same protocol as VCTacotron2 so tasks/vc.py can select it
via ``vc_model: transformer``: __call__ → (loss, stats);
inference → (feats_after_postnet, olens, att_placeholder).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.layers.embedding import ScaledPositionalEncoding
from espnet_tpu.models.asr.transformer_decoder import TransformerDecoderLayer
from espnet_tpu.models.asr.transformer_encoder import TransformerEncoderLayer
from espnet_tpu.models.tts.tacotron2 import Postnet, Prenet, optax_bce
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class VCTransformer(nn.Module):
    idim: int = 80           # source feature dim
    n_mels: int = 80         # target feature dim
    adim: int = 384
    aheads: int = 4
    elayers: int = 6
    eunits: int = 1536
    dlayers: int = 6
    dunits: int = 1536
    prenet_units: int = 256
    postnet_layers: int = 5
    reduction_factor: int = 1          # decoder (target) reduction
    encoder_reduction_factor: int = 1  # source frame stacking (:469-470)
    dropout_rate: float = 0.1
    bce_pos_weight: float = 5.0

    def setup(self):
        self.src_proj = nn.Dense(self.adim)
        self.enc_pos = ScaledPositionalEncoding(self.adim, self.dropout_rate)
        self.enc_layers = [
            TransformerEncoderLayer(
                self.adim, self.aheads, self.eunits, self.dropout_rate
            )
            for _ in range(self.elayers)
        ]
        self.enc_norm = nn.LayerNorm(epsilon=1e-12)
        self.prenet = Prenet(self.prenet_units)
        self.pre_proj = nn.Dense(self.adim)
        self.dec_pos = ScaledPositionalEncoding(self.adim, self.dropout_rate)
        self.dec_layers = [
            TransformerDecoderLayer(
                self.adim, self.aheads, self.dunits, self.dropout_rate
            )
            for _ in range(self.dlayers)
        ]
        self.dec_norm = nn.LayerNorm(epsilon=1e-12)
        self.feat_out = nn.Dense(self.n_mels * self.reduction_factor)
        self.prob_out = nn.Dense(self.reduction_factor)
        self.postnet = Postnet(self.n_mels, layers=self.postnet_layers)

    def _encode(self, xs, ilens, deterministic):
        """Stack encoder_reduction_factor source frames, project, encode."""
        b, t, idim = xs.shape
        erf = self.encoder_reduction_factor
        if erf > 1:
            t_trim = (t // erf) * erf
            xs = xs[:, :t_trim].reshape(b, t_trim // erf, idim * erf)
            ilens = ilens // erf
        x = self.src_proj(xs)
        x = self.enc_pos(x, deterministic=deterministic)
        mask = make_non_pad_mask(ilens, x.shape[1])[:, None, :]
        for layer in self.enc_layers:
            x = layer(x, mask, deterministic=deterministic)
        return self.enc_norm(x), ilens

    def _decode(self, memory, memory_lens, frames_in, olens_steps, deterministic):
        b, s, _ = frames_in.shape
        x = self.pre_proj(self.prenet(frames_in))
        x = self.dec_pos(x, deterministic=deterministic)
        self_mask = subsequent_mask(s)[None]
        if olens_steps is not None:
            self_mask = self_mask & make_non_pad_mask(olens_steps, s)[:, None, :]
        mem_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        for layer in self.dec_layers:
            x = layer(x, self_mask, memory, mem_mask, deterministic=deterministic)
        x = self.dec_norm(x)
        return self.feat_out(x), self.prob_out(x)

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        memory, mem_lens = self._encode(xs, ilens, deterministic)
        b, t_dec, _ = speech.shape
        r = self.reduction_factor
        if t_dec % r:
            pad = r - t_dec % r
            speech = jnp.pad(speech, ((0, 0), (0, pad), (0, 0)))
            t_dec = t_dec + pad
        steps = t_dec // r
        ys_groups = speech.reshape(b, steps, r, self.n_mels)[:, :, -1]
        go = jnp.zeros((b, 1, self.n_mels), speech.dtype)
        frames_in = jnp.concatenate([go, ys_groups[:, :-1]], axis=1)
        olens_steps = speech_lengths // r
        frames, stop = self._decode(
            memory, mem_lens, frames_in, olens_steps, deterministic
        )
        before = frames.reshape(b, steps * r, self.n_mels)
        stop = stop.reshape(b, steps * r)
        after = before + self.postnet(before, deterministic)

        mask = make_non_pad_mask(speech_lengths, t_dec)[..., None]
        n_valid = jnp.maximum(mask.sum(), 1) * self.n_mels
        l1_loss = (
            (jnp.abs(before - speech) + jnp.abs(after - speech)) * mask
        ).sum() / n_valid
        mse_loss = (
            ((before - speech) ** 2 + (after - speech) ** 2) * mask
        ).sum() / n_valid
        pos = jnp.arange(t_dec)[None, :]
        stop_target = (pos >= (speech_lengths - 1)[:, None]).astype(jnp.float32)
        stop_mask = make_non_pad_mask(speech_lengths, t_dec)
        bce_loss = (
            optax_bce(stop, stop_target, self.bce_pos_weight) * stop_mask
        ).sum() / jnp.maximum(stop_mask.sum(), 1)
        loss = l1_loss + mse_loss + bce_loss
        stats = {
            "l1_loss": l1_loss,
            "mse_loss": mse_loss,
            "bce_loss": bce_loss,
            "loss": loss,
        }
        return loss, stats

    def inference(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        threshold: float = 0.5,
        maxlenratio: float = 3.0,
        minlenratio: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Autoregressive conversion with static buffers → (feats, olens, att)."""
        b, l, _ = xs.shape
        r = self.reduction_factor
        maxsteps = max(int(maxlenratio * l) // r, 1)
        minframes = int(minlenratio * l)
        memory, mem_lens = self._encode(xs, ilens, True)
        frames_buf = jnp.zeros((b, maxsteps + 1, self.n_mels))
        out_buf = jnp.zeros((b, maxsteps, r, self.n_mels))
        stopped = jnp.zeros((b,), bool)
        olens = jnp.zeros((b,), jnp.int32)

        for step in range(maxsteps):
            frames, stop = self._decode(
                memory, mem_lens, frames_buf[:, : step + 1], None, True
            )
            last = frames[:, step].reshape(b, r, self.n_mels)
            prob = jax.nn.sigmoid(stop[:, step]).max(axis=-1)
            frames_buf = frames_buf.at[:, step + 1].set(last[:, -1])
            out_buf = out_buf.at[:, step].set(last)
            olens = jnp.where(stopped, olens, (step + 1) * r)
            can_stop = (step + 1) * r >= minframes
            stopped = stopped | ((prob >= threshold) & can_stop)
        before = out_buf.reshape(b, maxsteps * r, self.n_mels)
        after = before + self.postnet(before, True)
        att = jnp.zeros((b, 1, 1))  # attention maps not materialised here
        return after, olens, att
