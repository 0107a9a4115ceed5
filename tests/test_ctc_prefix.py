"""CTC prefix scorer validated against brute-force path enumeration.

Prefix probability P(output starts with h) = sum over all T-frame paths
whose collapsed label sequence has h as a prefix; eos score = P(output
== g exactly). Tiny T/V makes exact enumeration feasible.
"""
import itertools

import jax.numpy as jnp
import numpy as np

from espnet_tpu.search.ctc_prefix import (
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_select,
)

BLANK = 0


def collapse(path):
    out = []
    prev = None
    for p in path:
        if p != BLANK and p != prev:
            out.append(p)
        prev = p
    return tuple(out)


def brute_force_scores(probs, prefix, eos):
    """probs: (T, V). Returns dict token -> P(output starts with prefix+[c]),
    plus eos -> P(output == prefix)."""
    t, v = probs.shape
    total = {}
    p_exact = 0.0
    pref = tuple(prefix)
    for path in itertools.product(range(v), repeat=t):
        p = float(np.prod([probs[i, c] for i, c in enumerate(path)]))
        lab = collapse(path)
        if lab == pref:
            p_exact += p
        if lab[: len(pref)] == pref and len(lab) > len(pref):
            c = lab[len(pref)]
            total[c] = total.get(c, 0.0) + p
    total[eos] = p_exact
    return total


def _case(seed=0, t=5, v=4):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, v).astype(np.float64)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return probs


def _run_scorer(probs, prefixes, eos):
    """Run the jax scorer through multiple steps to reach each prefix, then
    score all candidates."""
    t, v = probs.shape
    logp = jnp.log(jnp.asarray(probs, dtype=jnp.float32))[None]  # (1,T,V)
    results = {}
    for prefix in prefixes:
        state = ctc_prefix_init(logp, jnp.array([t]))
        for tok in prefix:
            cand = jnp.arange(v)[None]  # score all tokens
            scores, cstate = ctc_prefix_score(
                state, logp, jnp.array([t]), cand, eos=eos
            )
            state = ctc_prefix_select(
                cstate, jnp.array([0]), jnp.array([tok])
            )
        cand = jnp.arange(v)[None]
        scores, _ = ctc_prefix_score(state, logp, jnp.array([t]), cand, eos=eos)
        # absolute log prob of prefix+c = incremental + prefix score
        results[tuple(prefix)] = np.asarray(scores[0]) + float(state.score[0])
    return results


def test_prefix_scores_match_brute_force():
    v = 4
    eos = v - 1  # treat last token as eos for scoring purposes
    probs = _case(seed=1, t=5, v=v)
    prefixes = [[], [1], [2], [1, 2], [1, 1]]
    got = _run_scorer(probs, prefixes, eos)
    for prefix in prefixes:
        bf = brute_force_scores(probs, prefix, eos)
        for c in range(1, v):  # skip blank
            expect = bf.get(c, 0.0)
            actual = float(np.exp(got[tuple(prefix)][c]))
            np.testing.assert_allclose(actual, expect, rtol=1e-4, atol=1e-7), (
                prefix,
                c,
            )


def test_repeated_label_constraint():
    # extending [1] with 1 requires an intervening blank — check the
    # same-label branch (phi = r_b only) against brute force explicitly
    v = 3
    probs = _case(seed=2, t=6, v=v)
    eos = v - 1
    got = _run_scorer(probs, [[1]], eos)
    bf = brute_force_scores(probs, [1], eos)
    np.testing.assert_allclose(
        float(np.exp(got[(1,)][1])), bf.get(1, 0.0), rtol=1e-4, atol=1e-8
    )


def test_variable_length_frames():
    # tlens < T must ignore trailing frames
    v = 4
    probs = _case(seed=3, t=7, v=v)
    eos = v - 1
    t_valid = 4
    logp_full = jnp.log(
        jnp.asarray(
            np.concatenate([probs[:t_valid], np.ones((3, v)) / v]), jnp.float32
        )
    )[None]
    state = ctc_prefix_init(logp_full, jnp.array([t_valid]))
    cand = jnp.arange(v)[None]
    scores, _ = ctc_prefix_score(state, logp_full, jnp.array([t_valid]), cand, eos=eos)
    bf = brute_force_scores(probs[:t_valid], [], eos)
    for c in range(1, v - 1):
        np.testing.assert_allclose(
            float(np.exp(scores[0, c])), bf.get(c, 0.0), rtol=1e-4, atol=1e-7
        )
