"""CTC loss: log-space forward recursion under lax.scan, plus Viterbi
forced alignment.

This is the TPU-native replacement for the reference's warp-ctc CUDA
dependency (espnet/nets/pytorch_backend/ctc.py:12, tools 'warp-ctc').
The recursion runs as a single lax.scan over time with the whole batch and
the blank-interleaved label dimension vectorised on the VPU; gradients come
from autodiff through the scan (the backward recursion XLA derives is the
standard beta pass). A fused Pallas kernel version lives in
espnet_tpu.losses.pallas_ctc (used when profitable).

Conventions (match reference): blank id 0, labels padded with -1,
reduction over batch is the caller's job; we return per-utterance negative
log likelihoods.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


def _interleave_blanks(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) labels → (B, 2L+1) blank-interleaved extended labels."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    return ext


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    Args:
        log_probs: (B, T, V) log-softmax outputs.
        labels: (B, L) target ids, padded arbitrarily beyond label_lengths.
        input_lengths: (B,) valid frame counts.
        label_lengths: (B,) valid label counts.
        blank: blank id (reference convention: 0).

    Returns:
        (B,) negative log likelihoods.
    """
    b, t, _ = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    labels = jnp.where(labels < 0, blank, labels)
    ext = _interleave_blanks(labels, blank)  # (B, S)
    # allow skip transition s-2 -> s when ext[s] != blank and ext[s] != ext[s-2]
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    allow_skip = (ext != blank) & (ext != ext_shift2)  # (B, S)

    # emission log-probs per extended label: (T, B, S)
    lp_t = jnp.transpose(log_probs, (1, 0, 2))  # (T, B, V)

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_t[0, :, blank])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(l > 0, jnp.take_along_axis(lp_t[0], ext[:, 1:2], axis=1)[:, 0], NEG_INF)
    )

    def step(alpha, inp):
        lp, tidx = inp  # lp: (B, V)
        emit = jnp.take_along_axis(lp, ext, axis=1)  # (B, S)
        a_prev1 = jnp.concatenate([jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a_prev2 = jnp.concatenate([jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a_prev2 = jnp.where(allow_skip, a_prev2, NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        new = m + jnp.log(jnp.sum(jnp.exp(stacked - m), axis=0)) + emit
        new = jnp.where(m <= NEG_INF / 2, NEG_INF, new)
        # freeze alpha past each utterance's end
        active = (tidx < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        return new, None

    tidxs = jnp.arange(1, t)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_t[1:], tidxs))

    # final states: ext index 2*label_len (last blank) and 2*label_len-1
    idx_last = 2 * label_lengths  # (B,)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(idx_last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    ll = jnp.where(m <= NEG_INF / 2, NEG_INF, ll)
    return -ll


def ctc_forced_align(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Viterbi forced alignment (reference: ctc.py:153 forced_align).

    Returns (B, T) int32 frame-level extended-label-position alignment
    mapped back to label ids (blank frames get `blank`).
    """
    b, t, _ = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    labels_c = jnp.where(labels < 0, blank, labels)
    ext = _interleave_blanks(labels_c, blank)
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    allow_skip = (ext != blank) & (ext != ext_shift2)

    lp_t = jnp.transpose(log_probs, (1, 0, 2))

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_t[0, :, blank])
    alpha0 = alpha0.at[:, 1].set(
        jnp.take_along_axis(lp_t[0], ext[:, 1:2], axis=1)[:, 0]
    )

    def step(alpha, inp):
        lp, tidx = inp
        emit = jnp.take_along_axis(lp, ext, axis=1)
        a_prev1 = jnp.concatenate([jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a_prev2 = jnp.concatenate([jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a_prev2 = jnp.where(allow_skip, a_prev2, NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)  # (3, B, S)
        choice = jnp.argmax(stacked, axis=0)  # (B, S) in {0,1,2}
        best = jnp.max(stacked, axis=0) + emit
        active = (tidx < input_lengths)[:, None]
        new = jnp.where(active, best, alpha)
        choice = jnp.where(active, choice, 0)
        return new, choice

    tidxs = jnp.arange(1, t)
    alpha, choices = jax.lax.scan(step, alpha0, (lp_t[1:], tidxs))
    # choices: (T-1, B, S) backpointers (offset into s-1, s-2)

    idx_last = 2 * label_lengths
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, jnp.maximum(idx_last - 1, 0)[:, None], axis=1)[:, 0]
    end_state = jnp.where(a_last >= a_prev, idx_last, jnp.maximum(idx_last - 1, 0))

    def backtrack(state, ch):
        # ch: (B, S) for this timestep
        off = jnp.take_along_axis(ch, state[:, None], axis=1)[:, 0]
        prev = state - off
        return prev, state

    state_T, states = jax.lax.scan(backtrack, end_state, choices, reverse=True)
    # states: (T-1, B) states at t=1..T-1; prepend state at t=0
    all_states = jnp.concatenate([state_T[None], states], axis=0)  # (T, B)
    all_states = jnp.transpose(all_states)  # (B, T)
    align = jnp.take_along_axis(ext, all_states, axis=1)  # label ids
    return align
