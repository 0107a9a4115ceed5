"""Batched CTC prefix scoring (Watanabe Algorithm 2).

TPU-native replacement for the reference's CTCPrefixScoreTH
(espnet/nets/pytorch_backend/ctc_prefix_score.py:12): the (T, 2, N, K)
recursion runs as one lax.scan over T with hyps N = batch×beam and K
candidate tokens vectorised on the VPU. All shapes static; state is
reindexed by gather after beam pruning (≙ index_select_state :190).

Score convention matches the reference: returned candidate scores are
INCREMENTAL, log ψ(g+c) − score_prev(g) (:188), so they add onto the
running hypothesis score.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


def _logadd(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


class CTCPrefixState(NamedTuple):
    """Per-hypothesis forward variables.

    r_b, r_nb: (N, T) log prob of prefix ending in blank / non-blank at t.
    score: (N,) log ψ of the prefix (for incremental scoring).
    last: (N,) last label of the prefix (-1 for empty).
    """

    r_b: jnp.ndarray
    r_nb: jnp.ndarray
    score: jnp.ndarray
    last: jnp.ndarray


def ctc_prefix_init(logp: jnp.ndarray, tlens: jnp.ndarray, blank: int = 0) -> CTCPrefixState:
    """logp: (N, T, V) CTC log-softmax (already tiled to batch×beam)."""
    n, t, _ = logp.shape
    mask = jnp.arange(t)[None, :] < tlens[:, None]  # (N, T) valid frames
    lp_blank = jnp.where(mask, logp[:, :, blank], 0.0)
    r_b = jnp.cumsum(lp_blank, axis=1)
    r_b = jnp.where(mask, r_b, NEG_INF)  # beyond T: impossible
    r_nb = jnp.full((n, t), NEG_INF)
    score = jnp.zeros((n,))
    last = jnp.full((n,), -1, dtype=jnp.int32)
    return CTCPrefixState(r_b, r_nb, score, last)


def ctc_prefix_score(
    state: CTCPrefixState,
    logp: jnp.ndarray,      # (N, T, V)
    tlens: jnp.ndarray,     # (N,)
    cand_ids: jnp.ndarray,  # (N, K) candidate next tokens
    eos: int,
    blank: int = 0,
) -> Tuple[jnp.ndarray, CTCPrefixState]:
    """Score extending each hypothesis with each candidate.

    Returns:
        scores: (N, K) incremental log ψ(g+c) − ψ(g).
        new_state: CTCPrefixState with (N, K, T) r arrays — gather the
        selected candidate per hyp afterwards with ctc_prefix_select.
    """
    n, t, v = logp.shape
    k = cand_ids.shape[1]
    lp_c = jnp.take_along_axis(logp, cand_ids[:, None, :], axis=2)  # (N,T,K)
    lp_c = jnp.transpose(lp_c, (1, 0, 2))  # (T,N,K)
    lp_blank = logp[:, :, blank].T  # (T,N)

    r_b_prev = state.r_b.T[..., None]  # (T,N,1)
    r_nb_prev = state.r_nb.T[..., None]

    same_as_last = cand_ids == state.last[:, None]  # (N,K)
    # phi[t] = r_b_prev[t] (+ r_nb_prev[t] unless c == last)
    phi = jnp.where(
        same_as_last[None], r_b_prev, _logadd(r_b_prev, r_nb_prev)
    )  # (T,N,K)

    frame_valid = (
        jnp.arange(t)[:, None] < tlens[None, :]
    )  # (T,N)

    # t=0 init: new prefix can start at frame 0 only if the old prefix is
    # empty (last == -1): r_nb[0] = p(c at 0); else -inf.
    empty = (state.last == -1)[:, None]  # (N,1)
    r_nb0 = jnp.where(empty, lp_c[0], NEG_INF)  # (N,K)
    r_b0 = jnp.full((n, k), NEG_INF)
    psi0 = r_nb0

    def step(carry, inp):
        r_b, r_nb, psi = carry  # (N,K) each
        lp_c_t, lp_b_t, phi_prev, valid_t = inp
        # phi_prev: phi at t-1; valid_t: frame t valid mask (N,)
        new_nb = _logadd(r_nb, phi_prev) + lp_c_t
        new_b = _logadd(r_b, r_nb) + lp_b_t[:, None]
        new_psi = _logadd(psi, phi_prev + lp_c_t)
        vmask = valid_t[:, None]
        r_nb = jnp.where(vmask, new_nb, r_nb)
        r_b = jnp.where(vmask, new_b, r_b)
        psi = jnp.where(vmask, new_psi, psi)
        return (r_b, r_nb, psi), (r_b, r_nb)

    (r_b_fin, r_nb_fin, psi), (r_b_hist, r_nb_hist) = jax.lax.scan(
        step,
        (r_b0, r_nb0, psi0),
        (lp_c[1:], lp_blank[1:], phi[:-1], frame_valid[1:]),
    )
    # histories: (T-1, N, K); prepend t=0
    r_b_all = jnp.concatenate([r_b0[None], r_b_hist], axis=0)
    r_nb_all = jnp.concatenate([r_nb0[None], r_nb_hist], axis=0)

    # eos candidate scores = log P(g ends) = r_b_prev[-1] + r_nb_prev[-1]
    # at the last valid frame (reference :171-176).
    idx_last = jnp.maximum(tlens - 1, 0)  # (N,)
    r_total_T = _logadd(
        jnp.take_along_axis(state.r_b, idx_last[:, None], axis=1),
        jnp.take_along_axis(state.r_nb, idx_last[:, None], axis=1),
    )  # (N,1)
    is_eos = cand_ids == eos
    psi = jnp.where(is_eos, r_total_T, psi)
    # blank as "next token" is never proposed in practice, but guard:
    psi = jnp.where(cand_ids == blank, NEG_INF, psi)

    scores = psi - state.score[:, None]  # incremental

    new_state = CTCPrefixState(
        r_b=jnp.transpose(r_b_all, (1, 2, 0)),    # (N,K,T)
        r_nb=jnp.transpose(r_nb_all, (1, 2, 0)),  # (N,K,T)
        score=psi,                                # (N,K)
        last=cand_ids,                            # (N,K)
    )
    return scores, new_state


def ctc_prefix_select(
    cand_state: CTCPrefixState, hyp_idx: jnp.ndarray, cand_idx: jnp.ndarray
) -> CTCPrefixState:
    """Gather chosen (hyp, candidate) pairs back to (N, T) / (N,) state.

    hyp_idx, cand_idx: (N,) indices of the surviving hypotheses.
    (≙ reference index_select_state :190.)
    """
    r_b = cand_state.r_b[hyp_idx, cand_idx]      # (N,T)
    r_nb = cand_state.r_nb[hyp_idx, cand_idx]
    score = cand_state.score[hyp_idx, cand_idx]
    last = cand_state.last[hyp_idx, cand_idx]
    return CTCPrefixState(r_b, r_nb, score, last)
