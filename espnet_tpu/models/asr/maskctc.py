"""Mask-CTC non-autoregressive ASR (reference:
espnet/nets/pytorch_backend/e2e_asr_maskctc.py E2E:32, maskctc/).

Training: joint CTC + CMLM loss — random target positions are replaced
with <mask> and a bidirectional (non-causal) transformer decoder predicts
them conditioned on the encoder output.
Inference (recognize:174): greedy CTC gives the initial hypothesis;
tokens whose CTC posterior is below threshold become <mask> and are
iteratively refilled, most-confident first, in K rounds.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.losses.label_smoothing import accuracy, label_smoothing_loss
from espnet_tpu.models.asr.ctc import CTCHead
from espnet_tpu.utils.masks import make_non_pad_mask


class MaskCTCModel(nn.Module):
    vocab_size: int       # includes <mask> as LAST id (vocab-1); eos = vocab-2
    encoder: nn.Module
    decoder: nn.Module    # TransformerDecoder(causal=False, vocab_size=vocab)
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    ignore_id: int = -1
    # optional in-graph wav→feature pipeline, composed like ASRModel /
    # TransducerModel (espnet2 model composition)
    frontend: Optional[nn.Module] = None
    normalize: Optional[nn.Module] = None

    @property
    def mask_id(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        self.ctc = CTCHead(self.vocab_size)

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
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        hs, hlens = self.encode(speech, speech_lengths, deterministic)
        ys = jnp.where(text == self.ignore_id, 0, text)
        loss_ctc = self.ctc(hs, hlens, ys, text_lengths, deterministic=deterministic)

        # CMLM: mask a random subset of target positions
        l = text.shape[1]
        valid = make_non_pad_mask(text_lengths, l)
        rng = self.make_rng("maskctc") if not deterministic else jax.random.PRNGKey(0)
        r_frac, r_pos = jax.random.split(rng)
        frac = jax.random.uniform(r_frac, (text.shape[0], 1), minval=0.2, maxval=1.0)
        mask_sel = (jax.random.uniform(r_pos, text.shape) < frac) & valid
        ys_in = jnp.where(mask_sel, self.mask_id, ys)
        logits = self.decoder(
            hs, hlens, ys_in, text_lengths, deterministic=deterministic
        )
        targets = jnp.where(mask_sel, text, self.ignore_id)
        loss_mlm = label_smoothing_loss(
            logits, targets, self.lsm_weight, self.ignore_id, normalize_length=True
        )
        loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_mlm
        stats = {
            "loss": loss,
            "loss_ctc": loss_ctc,
            "loss_mlm": loss_mlm,
            "acc_mlm": accuracy(logits, targets, self.ignore_id),
        }
        return loss, stats

    def ctc_log_softmax(self, hs):
        return self.ctc.log_softmax(hs)


def maskctc_recognize(
    model: MaskCTCModel,
    variables,
    speech: np.ndarray,
    speech_lengths: np.ndarray,
    threshold: float = 0.99,
    n_iterations: int = 3,
):
    """Host-driven iterative decoding (e2e_asr_maskctc.py:174)."""
    import jax.numpy as jnp

    hs, hlens = model.apply(
        variables, jnp.asarray(speech), jnp.asarray(speech_lengths), method="encode"
    )
    logp = np.asarray(model.apply(variables, hs, method="ctc_log_softmax"))
    hlens_np = np.asarray(hlens)
    results = []
    for b in range(logp.shape[0]):
        # greedy CTC with per-token confidence (max prob over its frames)
        path = logp[b, : hlens_np[b]].argmax(-1)
        probs = np.exp(logp[b, : hlens_np[b]].max(-1))
        toks, confs, prev = [], [], -1
        for t, p in enumerate(path):
            if p != 0 and p != prev:
                toks.append(int(p))
                confs.append(probs[t])
            elif p != 0 and p == prev:
                confs[-1] = max(confs[-1], probs[t])
            prev = p
        if not toks:
            results.append([])
            continue
        y = np.array(toks)
        conf = np.array(confs)
        masked = conf < threshold
        n_mask = int(masked.sum())
        if n_mask == 0:
            results.append(list(y))
            continue
        y_work = y.copy()
        y_work[masked] = model.mask_id
        per_iter = max(1, n_mask // n_iterations)
        for _ in range(n_iterations * 2):
            still = y_work == model.mask_id
            if not still.any():
                break
            dec_in = jnp.asarray(y_work[None])
            logits = model.apply(
                variables,
                hs[b: b + 1],
                hlens[b: b + 1],
                dec_in,
                jnp.array([len(y_work)]),
                method=lambda m, *a: m.decoder(*a),
            )
            lp = np.asarray(jax.nn.log_softmax(logits[0], -1))
            cand = lp[still][:, : model.mask_id]  # never predict <mask>
            best_tok = cand.argmax(-1)
            best_conf = cand.max(-1)
            order = np.argsort(-best_conf)[:per_iter]
            idxs = np.where(still)[0][order]
            y_work[idxs] = best_tok[order]
        results.append(list(y_work))
    return results
