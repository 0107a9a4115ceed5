"""RNN-T (transducer) loss — TPU-native replacement for warp-transducer /
warp-rnnt (reference: espnet/nets/pytorch_backend/transducer/loss.py:8).

Forward recursion over the (T, U) lattice:
    α(t,u) = logadd(α(t-1,u) + blank(t-1,u), α(t,u-1) + emit(t,u-1))
Within each time step the u-recursion is a log-space LINEAR recurrence,
solved in one shot with cumlogsumexp (no sequential u loop):
    α(t,u) = C(u) + logcumsumexp_u(A(u) − C(u)),
    A(u) = α(t-1,u) + blank(t-1,u),  C(u) = Σ_{j<u} emit(t,j).
One lax.scan over T, everything else vectorised — the standard
wavefront-free TPU formulation. Gradients via autodiff.

Memory: takes pre-gathered blank/emit log-probs (B, T, U+1) instead of
the full (B, T, U+1, V) normalized tensor; use rnnt_loss_from_logits for
the convenience path.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


def rnnt_loss_from_log_probs(
    lp_blank: jnp.ndarray,   # (B, T, U+1) log P(blank | t, u)
    lp_emit: jnp.ndarray,    # (B, T, U)   log P(y_{u+1} | t, u)
    input_lengths: jnp.ndarray,   # (B,)
    label_lengths: jnp.ndarray,   # (B,)
) -> jnp.ndarray:
    b, t, u1 = lp_blank.shape
    u = u1 - 1

    # emit beyond label length is impossible
    upos = jnp.arange(u)[None, None, :]  # (1, 1, U)
    lp_emit = jnp.where(upos < label_lengths[:, None, None], lp_emit, NEG_INF)

    # at t=0: alpha(0,u) = sum_{j<u} emit(0,j)
    c0 = jnp.concatenate(
        [jnp.zeros((b, 1)), jnp.cumsum(lp_emit[:, 0], axis=1)], axis=1
    )
    alpha0 = jnp.maximum(c0, NEG_INF)

    def step(alpha, inp):
        lpb_prev, lpe_t, tidx = inp
        # A(u) = alpha(t-1,u) + blank(t-1,u)
        a = alpha + lpb_prev  # (B, U+1)
        # C(u) = cumulative emits at time t before u
        c = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.cumsum(lpe_t, axis=1)], axis=1
        )  # (B, U+1)
        new_alpha = c + jax.lax.cumlogsumexp(a - c, axis=1)
        new_alpha = jnp.maximum(new_alpha, NEG_INF)
        active = (tidx < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    tidxs = jnp.arange(1, t)
    alpha, _ = jax.lax.scan(
        step,
        alpha0,
        (
            jnp.transpose(lp_blank[:, :-1], (1, 0, 2)),
            jnp.transpose(lp_emit[:, 1:], (1, 0, 2)),
            tidxs,
        ),
    )

    # final: alpha(T-1, U) + blank(T-1, U) at each sample's T, U
    a_final = jnp.take_along_axis(alpha, label_lengths[:, None], axis=1)[:, 0]
    idx_t = jnp.maximum(input_lengths - 1, 0)
    lpb_fin = jnp.take_along_axis(
        lp_blank, idx_t[:, None, None], axis=1
    )[:, 0]  # (B, U+1)
    lpb_fin = jnp.take_along_axis(lpb_fin, label_lengths[:, None], axis=1)[:, 0]
    return -(a_final + lpb_fin)


def rnnt_loss(
    logits: jnp.ndarray,          # (B, T, U+1, V) joint network outputs
    labels: jnp.ndarray,          # (B, U)
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance RNN-T negative log-likelihood."""
    lse = jax.nn.logsumexp(logits, axis=-1)  # (B, T, U+1)
    lp_blank = logits[..., blank] - lse
    labels_c = jnp.where(labels < 0, 0, labels)
    # emit(t, u) = log P(labels[u] | t, u)
    lab = jnp.broadcast_to(
        labels_c[:, None, :], (logits.shape[0], logits.shape[1], labels.shape[1])
    )
    lp_emit = (
        jnp.take_along_axis(logits[:, :, :-1, :], lab[..., None], axis=3)[..., 0]
        - lse[:, :, :-1]
    )
    return rnnt_loss_from_log_probs(lp_blank, lp_emit, input_lengths, label_lengths)
