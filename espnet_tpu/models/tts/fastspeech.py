"""FastSpeech2 (+FastSpeech1 subset) non-autoregressive TTS
(reference: espnet2/tts/fastspeech2.py:39, fastspeech/duration_predictor.py:14,
length_regulator.py:20, variance_predictor.py:15).

TPU design note: the length regulator is a matmul with a 0/1 alignment
matrix built from cumulative durations (static output length), instead of
the reference's per-utterance repeat_interleave — no dynamic shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr.transformer_encoder import TransformerEncoderLayer
from espnet_tpu.layers.embedding import PositionalEncoding
from espnet_tpu.models.tts.tacotron2 import Postnet
from espnet_tpu.utils.masks import make_non_pad_mask


class VariancePredictor(nn.Module):
    """2×(conv1d k3 + ReLU + LN + dropout) + linear → (B, L)."""

    chans: int = 256
    kernel: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(self.chans, (self.kernel,), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-12)(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(1)(x)[..., 0]


def length_regulate(
    enc: jnp.ndarray,        # (B, L, D)
    durations: jnp.ndarray,  # (B, L) int frames per token
    out_len: int,
) -> jnp.ndarray:
    """Expand token states to frames via alignment matmul (static shape)."""
    cum = jnp.cumsum(durations, axis=1)  # (B, L)
    starts = cum - durations
    frames = jnp.arange(out_len)[None, :, None]  # (1, T, 1)
    align = (frames >= starts[:, None, :]) & (frames < cum[:, None, :])
    return jnp.einsum("btl,bld->btd", align.astype(enc.dtype), enc)


def durations_from_attention(
    att_ws: jnp.ndarray, ilens: jnp.ndarray, olens: jnp.ndarray
) -> jnp.ndarray:
    """Teacher durations = per-token argmax counts of a (B, Tdec, Tenc)
    attention (reference fastspeech/duration_calculator.py:16)."""
    b, t_dec, t_enc = att_ws.shape
    amax = jnp.argmax(att_ws, axis=-1)  # (B, Tdec)
    valid = make_non_pad_mask(olens, t_dec)
    onehot = jax.nn.one_hot(amax, t_enc) * valid[..., None]
    return onehot.sum(axis=1).astype(jnp.int32)  # (B, Tenc)


class FastSpeech2(nn.Module):
    vocab_size: int
    n_mels: int = 80
    adim: int = 384
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1536
    dlayers: int = 4
    dunits: int = 1536
    use_pitch: bool = True
    use_energy: bool = True
    postnet_layers: int = 5
    postnet_chans: int = 512
    dropout_rate: float = 0.2
    duration_offset: float = 1.0  # log(d + offset) regression target
    norm_type: str = "group"  # postnet norm; "batch" = reference numerics
    dtype: type = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.adim)
        self.enc_pos = PositionalEncoding(self.adim, self.dropout_rate)
        self.enc_layers = [
            TransformerEncoderLayer(
                self.adim, self.aheads, self.eunits, self.dropout_rate,
                dtype=self.dtype,
            )
            for _ in range(self.elayers)
        ]
        self.enc_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.duration_predictor = VariancePredictor(self.adim)
        if self.use_pitch:
            self.pitch_predictor = VariancePredictor(self.adim)
            self.pitch_embed = nn.Conv(self.adim, (9,), padding="SAME")
        if self.use_energy:
            self.energy_predictor = VariancePredictor(self.adim)
            self.energy_embed = nn.Conv(self.adim, (9,), padding="SAME")
        self.dec_pos = PositionalEncoding(self.adim, self.dropout_rate)
        self.dec_layers = [
            TransformerEncoderLayer(
                self.adim, self.aheads, self.dunits, self.dropout_rate,
                dtype=self.dtype,
            )
            for _ in range(self.dlayers)
        ]
        self.dec_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.feat_out = nn.Dense(self.n_mels)
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

    def _decode(self, h, olens, out_len, deterministic):
        x = self.dec_pos(h, deterministic=deterministic)
        mask = make_non_pad_mask(olens, out_len)[:, None, :]
        for layer in self.dec_layers:
            x = layer(x, mask, deterministic=deterministic)
        x = self.dec_norm(x)
        return self.feat_out(x)

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,         # (B, Tdec, n_mels)
        speech_lengths: jnp.ndarray,
        durations: jnp.ndarray,       # (B, L) teacher durations (frames)
        pitch: Optional[jnp.ndarray] = None,    # (B, L) token-avg pitch
        energy: Optional[jnp.ndarray] = None,   # (B, L)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        h = self._encode(text, text_lengths, deterministic)
        tok_mask = make_non_pad_mask(text_lengths, text.shape[1])
        n_tok = jnp.maximum(tok_mask.sum(), 1)
        durations = jnp.maximum(durations, 0)  # strip -1 padding

        d_pred = self.duration_predictor(h, deterministic)  # log domain
        d_target = jnp.log(durations.astype(jnp.float32) + self.duration_offset)
        duration_loss = (((d_pred - d_target) ** 2) * tok_mask).sum() / n_tok

        stats: Dict[str, jnp.ndarray] = {"duration_loss": duration_loss}
        var_loss = 0.0
        if self.use_pitch and pitch is not None:
            p_pred = self.pitch_predictor(h, deterministic)
            pitch_loss = (((p_pred - pitch) ** 2) * tok_mask).sum() / n_tok
            h = h + self.pitch_embed(pitch[..., None])
            stats["pitch_loss"] = pitch_loss
            var_loss += pitch_loss
        if self.use_energy and energy is not None:
            e_pred = self.energy_predictor(h, deterministic)
            energy_loss = (((e_pred - energy) ** 2) * tok_mask).sum() / n_tok
            h = h + self.energy_embed(energy[..., None])
            stats["energy_loss"] = energy_loss
            var_loss += energy_loss

        out_len = speech.shape[1]
        hd = length_regulate(h, durations, out_len)
        before = self._decode(hd, speech_lengths, out_len, deterministic)
        after = before + self.postnet(before, deterministic)

        fmask = make_non_pad_mask(speech_lengths, out_len)[..., None]
        n_frame = jnp.maximum(fmask.sum(), 1) * self.n_mels
        l1 = (jnp.abs(before - speech) + jnp.abs(after - speech)) * fmask
        l1_loss = l1.sum() / n_frame

        loss = l1_loss + duration_loss + var_loss
        stats.update({"l1_loss": l1_loss, "loss": loss})
        return loss, stats

    def inference(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        max_out_len: int = 1000,
        d_factor: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Predict durations/pitch/energy → mel (B, max_out_len, n_mels),
        lengths."""
        h = self._encode(text, text_lengths, True)
        tok_mask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(h, True)
        dur = jnp.clip(
            jnp.round(
                (jnp.exp(d_pred) - self.duration_offset) * d_factor
            ).astype(jnp.int32),
            0,
        )
        dur = dur * tok_mask.astype(jnp.int32)
        if self.use_pitch:
            h = h + self.pitch_embed(self.pitch_predictor(h, True)[..., None])
        if self.use_energy:
            h = h + self.energy_embed(self.energy_predictor(h, True)[..., None])
        olens = jnp.minimum(dur.sum(axis=1), max_out_len)
        hd = length_regulate(h, dur, max_out_len)
        before = self._decode(hd, olens, max_out_len, True)
        after = before + self.postnet(before, True)
        return after, olens
