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


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1) -> jnp.ndarray:
    """Token accuracy (reference nets_utils.th_accuracy:299)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = (pred == targets) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1)
