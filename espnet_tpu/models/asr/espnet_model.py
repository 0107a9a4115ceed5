"""Hybrid CTC/attention ASR model (reference:
espnet2/asr/espnet_model.py:36 ESPnetASRModel).

Composable: frontend → specaug → normalize → encoder → {CTC head,
attention decoder}; loss = α·ctc + (1−α)·att (reference e2e_asr.py:327).
Fully functional: one `__call__` under jit computes loss and stats; the
`encode` method is reused by the inference path.

Conventions (reference parity, SURVEY A.2): sos == eos == vocab-1,
blank == 0, ignore_id == -1.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.losses.label_smoothing import accuracy, label_smoothing_loss
from espnet_tpu.models.asr.ctc import CTCHead
from espnet_tpu.ops.specaug import spec_augment


def add_sos_eos(
    ys: jnp.ndarray, ylens: jnp.ndarray, sos: int, eos: int, ignore_id: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) padded targets → (ys_in (B, L+1) with sos, ys_out (B, L+1)
    with eos at position ylen, ignore_id beyond)."""
    b, l = ys.shape
    ys_clip = jnp.where(ys == ignore_id, eos, ys)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, dtype=ys.dtype), ys_clip], axis=1
    )
    pos = jnp.arange(l + 1)[None, :]
    ys_out = jnp.concatenate([ys_clip, jnp.full((b, 1), eos, dtype=ys.dtype)], axis=1)
    ys_out = jnp.where(pos == ylens[:, None], eos, ys_out)
    ys_out = jnp.where(pos > ylens[:, None], ignore_id, ys_out)
    # mask ys_in beyond ylen+1 is harmless (attention-masked); keep eos fill
    return ys_in, ys_out


class ASRModel(nn.Module):
    vocab_size: int
    encoder: nn.Module
    decoder: Optional[nn.Module] = None
    frontend: Optional[nn.Module] = None
    normalize: Optional[nn.Module] = None
    ctc_weight: float = 0.5
    lsm_weight: float = 0.0
    # corpus-unigram smoothing (reference lsm_type='unigram',
    # e2e_asr_common.py:55): non-empty labeldist switches the attention
    # loss to the RNN-decoder KL-regularizer mix (decoders.py:303-309)
    lsm_type: str = ""
    labeldist: Tuple[float, ...] = ()
    ignore_id: int = -1
    use_specaug: bool = False
    specaug_conf: Optional[Tuple[Tuple[str, Any], ...]] = None
    length_normalized_loss: bool = False
    # compute dtype for the CTC projection head (encoder/decoder carry
    # their own dtype); loss math stays f32
    dtype: type = jnp.float32

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        if self.ctc_weight > 0.0:
            self.ctc = CTCHead(self.vocab_size, dtype=self.dtype)

    def encode(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frontend → specaug → normalize → encoder (reference
        espnet2/asr/espnet_model.py:178)."""
        if self.frontend is not None:
            feats, feat_lens = self.frontend(speech, speech_lengths)
        else:
            feats, feat_lens = speech, speech_lengths
        if self.use_specaug and not deterministic:
            conf = dict(self.specaug_conf or ())
            feats = spec_augment(self.make_rng("specaug"), feats, **conf)
        if self.normalize is not None:
            feats = self.normalize(feats, feat_lens)
        return self.encoder(feats, feat_lens, deterministic=deterministic)

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        hs, hlens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}

        loss_ctc = 0.0
        if self.ctc_weight > 0.0:
            ys_ctc = jnp.where(text == self.ignore_id, 0, text)
            loss_ctc = self.ctc(
                hs, hlens, ys_ctc, text_lengths, deterministic=deterministic
            )
            stats["loss_ctc"] = loss_ctc

        loss_att = 0.0
        if self.ctc_weight < 1.0 and self.decoder is not None:
            ys_in, ys_out = add_sos_eos(
                text, text_lengths, self.sos, self.eos, self.ignore_id
            )
            logits = self.decoder(
                hs, hlens, ys_in, text_lengths + 1, deterministic=deterministic
            )
            if self.lsm_type == "unigram" and self.labeldist:
                from espnet_tpu.losses.label_smoothing import (
                    unigram_label_smoothing_loss,
                )

                loss_att = unigram_label_smoothing_loss(
                    logits,
                    ys_out,
                    text_lengths,
                    jnp.asarray(self.labeldist, dtype=jnp.float32),
                    self.lsm_weight,
                    ignore_id=self.ignore_id,
                )
            else:
                loss_att = label_smoothing_loss(
                    logits,
                    ys_out,
                    smoothing=self.lsm_weight,
                    ignore_id=self.ignore_id,
                    normalize_length=self.length_normalized_loss,
                )
            stats["loss_att"] = loss_att
            stats["acc"] = accuracy(logits, ys_out, self.ignore_id)

        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats

    def ctc_log_softmax(self, hs: jnp.ndarray) -> jnp.ndarray:
        return self.ctc.log_softmax(hs)
