"""Transformer-TTS (reference: e2e_tts_transformer.py Transformer:112).

Encoder-decoder transformer over (text → mel frames) with decoder prenet,
scaled positional encoding, stop-token head, postnet, and the same
L1+MSE+BCE(+guided-attn) loss family as Tacotron2. Teacher-forced
training; scan-based autoregressive inference re-running the static
prefix (KV-cache variant is a later optimisation).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.layers.embedding import ScaledPositionalEncoding
from espnet_tpu.models.asr.transformer_decoder import TransformerDecoderLayer
from espnet_tpu.models.asr.transformer_encoder import TransformerEncoderLayer
from espnet_tpu.models.tts.tacotron2 import Postnet, Prenet, optax_bce
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class TransformerTTS(nn.Module):
    vocab_size: int
    n_mels: int = 80
    adim: int = 384
    aheads: int = 4
    elayers: int = 6
    eunits: int = 1536
    dlayers: int = 6
    dunits: int = 1536
    prenet_units: int = 256
    prenet_dropout_rate: float = 0.5  # reference --dprenet-dropout-rate
    postnet_layers: int = 5
    postnet_chans: int = 512
    reduction_factor: int = 1
    dropout_rate: float = 0.1
    bce_pos_weight: float = 5.0
    norm_type: str = "group"  # postnet norm; "batch" = reference numerics
    dtype: type = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.adim)
        self.enc_pos = ScaledPositionalEncoding(self.adim, self.dropout_rate)
        self.enc_layers = [
            TransformerEncoderLayer(
                self.adim, self.aheads, self.eunits, self.dropout_rate,
                dtype=self.dtype,
            )
            for _ in range(self.elayers)
        ]
        self.enc_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.prenet = Prenet(
            self.prenet_units, dropout_rate=self.prenet_dropout_rate
        )
        self.pre_proj = nn.Dense(self.adim)
        self.dec_pos = ScaledPositionalEncoding(self.adim, self.dropout_rate)
        self.dec_layers = [
            TransformerDecoderLayer(
                self.adim, self.aheads, self.dunits, self.dropout_rate,
                dtype=self.dtype,
            )
            for _ in range(self.dlayers)
        ]
        self.dec_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.feat_out = nn.Dense(self.n_mels * self.reduction_factor)
        self.prob_out = nn.Dense(self.reduction_factor)
        self.postnet = Postnet(
            self.n_mels,
            self.postnet_chans,
            layers=self.postnet_layers,
            norm_type=self.norm_type,
        )

    def _encode(self, text, text_lengths, deterministic):
        x = self.embed(text)
        x = self.enc_pos(x, deterministic=deterministic)
        mask = make_non_pad_mask(text_lengths, text.shape[1])[:, None, :]
        for layer in self.enc_layers:
            x = layer(x, mask, deterministic=deterministic)
        return self.enc_norm(x)

    def _decode(self, memory, memory_lens, frames_in, olens_steps, deterministic):
        """frames_in: (B, S, n_mels) previous-frame inputs (S steps)."""
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
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        memory = self._encode(text, text_lengths, deterministic)
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
            memory, text_lengths, frames_in, olens_steps, deterministic
        )
        before = frames.reshape(b, steps * r, self.n_mels)
        stop = stop.reshape(b, steps * r)
        after = before + self.postnet(before, deterministic)

        mask = make_non_pad_mask(speech_lengths, t_dec)[..., None]
        n_valid = jnp.maximum(mask.sum(), 1) * self.n_mels
        l1_loss = ((jnp.abs(before - speech) + jnp.abs(after - speech)) * mask).sum() / n_valid
        mse_loss = (((before - speech) ** 2 + (after - speech) ** 2) * mask).sum() / n_valid
        pos = jnp.arange(t_dec)[None, :]
        stop_target = (pos >= (speech_lengths - 1)[:, None]).astype(jnp.float32)
        stop_mask = make_non_pad_mask(speech_lengths, t_dec)
        bce_loss = (optax_bce(stop, stop_target, self.bce_pos_weight) * stop_mask).sum() / jnp.maximum(stop_mask.sum(), 1)
        loss = l1_loss + mse_loss + bce_loss
        stats = {"l1_loss": l1_loss, "mse_loss": mse_loss, "bce_loss": bce_loss, "loss": loss}
        return loss, stats

    def inference(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        threshold: float = 0.5,
        maxlenratio: float = 10.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Autoregressive synthesis with static buffers."""
        b, l = text.shape
        r = self.reduction_factor
        maxsteps = max(int(maxlenratio * l) // r, 1)
        memory = self._encode(text, text_lengths, True)
        frames_buf = jnp.zeros((b, maxsteps + 1, self.n_mels))
        out_buf = jnp.zeros((b, maxsteps, r, self.n_mels))
        stopped = jnp.zeros((b,), bool)
        olens = jnp.zeros((b,), jnp.int32)

        for step in range(maxsteps):
            frames, stop = self._decode(
                memory, text_lengths, frames_buf[:, : step + 1], None, True
            )
            last = frames[:, step].reshape(b, r, self.n_mels)
            prob = jax.nn.sigmoid(stop[:, step]).max(axis=-1)
            frames_buf = frames_buf.at[:, step + 1].set(last[:, -1])
            out_buf = out_buf.at[:, step].set(last)
            olens = jnp.where(stopped, olens, (step + 1) * r)
            stopped = stopped | (prob >= threshold)
        before = out_buf.reshape(b, maxsteps * r, self.n_mels)
        after = before + self.postnet(before, True)
        return after, olens
