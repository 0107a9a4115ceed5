"""Speech translation + machine translation models
(reference: espnet/nets/pytorch_backend/e2e_st_transformer.py:40,
e2e_mt_transformer.py:38).

STModel: speech encoder → translation decoder, with optional auxiliary
ASR CTC and ASR attention decoder losses on the source transcript
(multi-task weights asr_weight·(ctc/att mix), e2e_st.py:78).
MTModel: token-embedding encoder → decoder (BLEU scored externally).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.losses.label_smoothing import accuracy, label_smoothing_loss
from espnet_tpu.models.asr.ctc import CTCHead
from espnet_tpu.models.asr.espnet_model import add_sos_eos


class STModel(nn.Module):
    vocab_size: int           # target (translation) vocab
    src_vocab_size: int       # source (transcript) vocab for aux ASR
    encoder: nn.Module
    decoder: nn.Module
    asr_decoder: Optional[nn.Module] = None
    frontend: Optional[nn.Module] = None   # raw wav → fbank in-graph
    normalize: Optional[nn.Module] = None
    asr_weight: float = 0.3
    mt_weight: float = 0.0
    mtlalpha: float = 0.5     # within asr_weight: ctc vs attention mix
    lsm_weight: float = 0.1
    ignore_id: int = -1

    def setup(self):
        if self.asr_weight > 0 and self.mtlalpha > 0:
            self.ctc = CTCHead(self.src_vocab_size)

    @property
    def sos(self):
        return self.vocab_size - 1

    @property
    def eos(self):
        return self.vocab_size - 1

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        if self.frontend is not None:
            speech, speech_lengths = self.frontend(speech, speech_lengths)
        if self.normalize is not None:
            speech = self.normalize(speech, speech_lengths)
        return self.encoder(speech, speech_lengths, deterministic=deterministic)

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,            # target translation tokens
        text_lengths: jnp.ndarray,
        src_text: Optional[jnp.ndarray] = None,
        src_text_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        hs, hlens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}

        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos, self.eos, self.ignore_id)
        logits = self.decoder(hs, hlens, ys_in, text_lengths + 1, deterministic=deterministic)
        loss_st = label_smoothing_loss(
            logits, ys_out, self.lsm_weight, self.ignore_id
        )
        stats["loss_st"] = loss_st
        stats["acc"] = accuracy(logits, ys_out, self.ignore_id)

        loss_asr_ctc = 0.0
        loss_asr_att = 0.0
        if self.asr_weight > 0 and src_text is not None:
            if self.mtlalpha > 0:
                ys_src = jnp.where(src_text == self.ignore_id, 0, src_text)
                loss_asr_ctc = self.ctc(
                    hs, hlens, ys_src, src_text_lengths, deterministic=deterministic
                )
                stats["loss_asr_ctc"] = loss_asr_ctc
            if self.mtlalpha < 1.0 and self.asr_decoder is not None:
                s_in, s_out = add_sos_eos(
                    src_text, src_text_lengths,
                    self.src_vocab_size - 1, self.src_vocab_size - 1, self.ignore_id,
                )
                a_logits = self.asr_decoder(
                    hs, hlens, s_in, src_text_lengths + 1, deterministic=deterministic
                )
                loss_asr_att = label_smoothing_loss(
                    a_logits, s_out, self.lsm_weight, self.ignore_id
                )
                stats["loss_asr_att"] = loss_asr_att

        loss = (
            (1.0 - self.asr_weight - self.mt_weight) * loss_st
            + self.asr_weight
            * (self.mtlalpha * loss_asr_ctc + (1 - self.mtlalpha) * loss_asr_att)
        )
        stats["loss"] = loss
        return loss, stats


class MTModel(nn.Module):
    vocab_size: int       # target vocab
    encoder: nn.Module    # TransformerEncoder(input_layer="embed", vocab_size=src)
    decoder: nn.Module
    lsm_weight: float = 0.1
    ignore_id: int = -1

    @property
    def sos(self):
        return self.vocab_size - 1

    @property
    def eos(self):
        return self.vocab_size - 1

    def encode(self, src: jnp.ndarray, src_lengths: jnp.ndarray, deterministic=True):
        src = jnp.where(src == self.ignore_id, 0, src)
        return self.encoder(src, src_lengths, deterministic=deterministic)

    def __call__(
        self,
        src_text: jnp.ndarray,
        src_text_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        hs, hlens = self.encode(src_text, src_text_lengths, deterministic)
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos, self.eos, self.ignore_id)
        logits = self.decoder(hs, hlens, ys_in, text_lengths + 1, deterministic=deterministic)
        loss = label_smoothing_loss(logits, ys_out, self.lsm_weight, self.ignore_id)
        stats = {
            "loss": loss,
            "acc": accuracy(logits, ys_out, self.ignore_id),
        }
        return loss, stats
