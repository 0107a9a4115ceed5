"""Label-smoothing cross entropy (reference:
espnet/nets/pytorch_backend/transformer/label_smoothing_loss.py:13).

KL(uniform-smoothed target || log-softmax) with ignore_id masking.
normalize_length=False divides by batch size (reference default),
True divides by token count.
"""
from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.1,
    ignore_id: int = -1,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """Scalar smoothed CE over (B, L, V) logits vs (B, L) int targets."""
    v = logits.shape[-1]
    valid = targets != ignore_id
    t_clip = jnp.where(valid, targets, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    confidence = 1.0 - smoothing
    smooth_val = smoothing / (v - 1)
    nll = -jnp.take_along_axis(log_probs, t_clip[..., None], axis=-1)[..., 0]
    smooth_term = -log_probs.sum(axis=-1)
    # Full KL(q||p) including -H(q), matching the reference's use of
    # nn.KLDivLoss (which adds the q*log(q) constant term).
    loss_tok = confidence * nll + smooth_val * (smooth_term - nll)
    if smoothing > 0.0:
        neg_entropy = confidence * jnp.log(confidence) + (v - 1) * smooth_val * jnp.log(
            smooth_val
        )
        loss_tok = loss_tok + neg_entropy
    loss_tok = jnp.where(valid, loss_tok, 0.0)
    denom = jnp.where(
        normalize_length, jnp.maximum(valid.sum(), 1), logits.shape[0]
    ).astype(logits.dtype)
    return loss_tok.sum() / denom


def label_smoothing_dist(
    vocab_size: int,
    token_id_seqs,
    blank: int = 0,
    eos: int | None = None,
) -> "jnp.ndarray":
    """Corpus-unigram label distribution for RNN-decoder loss smoothing
    (reference: espnet/nets/e2e_asr_common.py:55 label_smoothing_dist,
    lsm_type='unigram').

    Counts token occurrences over the training transcripts, adds one
    <eos> per utterance, floors zero counts to 1, zeroes the blank, and
    normalizes. Host-side numpy; returns float32 (V,)."""
    import numpy as np

    eos = vocab_size - 1 if eos is None else eos
    counts = np.zeros(vocab_size, dtype=np.float64)
    n_utts = 0
    for ids in token_id_seqs:
        ids = np.asarray(ids, dtype=np.int64)
        if ids.size:
            np.add.at(counts, ids, 1.0)
        n_utts += 1
    counts[eos] += n_utts
    counts[counts == 0] = 1.0
    counts[blank] = 0.0
    return (counts / counts.sum()).astype("float32")


def unigram_label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    labeldist: jnp.ndarray,
    lsm_weight: float,
    ignore_id: int = -1,
) -> jnp.ndarray:
    """RNN-decoder attention loss with the corpus-unigram KL regularizer
    (reference: espnet/nets/pytorch_backend/rnn/decoders.py:268-309).

    loss = (1-w)·CE + w·loss_reg where CE is the token-mean cross
    entropy scaled by the mean label length (the reference's
    `self.loss *= np.mean([len(x) for x in ys_in]) - 1`), and
    loss_reg = -Σ log_softmax(logits)·labeldist / B summed over ALL
    positions including padding (the reference's `.view(-1)` applies no
    mask — kept for exact parity)."""
    ce_tok = label_smoothing_loss(
        logits, targets, smoothing=0.0, ignore_id=ignore_id,
        normalize_length=True,
    )
    ce = ce_tok * jnp.mean(target_lengths.astype(logits.dtype))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss_reg = -(logp * labeldist).sum() / logits.shape[0]
    return (1.0 - lsm_weight) * ce + lsm_weight * loss_reg


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1) -> jnp.ndarray:
    """Token accuracy (reference nets_utils.th_accuracy:299)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = (pred == targets) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1)
