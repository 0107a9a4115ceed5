"""Beam search tests: with a wide-enough beam the search must find the
same best hypothesis and score as exhaustive enumeration over all label
sequences (the analog of reference test_beam_search.py equivalence
checks)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import ASRModel, TransformerDecoder, TransformerEncoder
from espnet_tpu.search.beam_search import BeamSearch
from espnet_tpu.search.greedy import ctc_greedy_decode, ctc_greedy_decode_host
from espnet_tpu.search.scorers import transformer_decoder_scorer
from tests.test_ctc_prefix import brute_force_scores

V = 5  # blank=0, tokens 1..3, sos/eos=4
B, T, D = 1, 6, 8


def _setup(seed=0, ctc_weight=0.0):
    rng = np.random.RandomState(seed)
    enc = TransformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1,
        input_layer="linear",
    )
    dec = TransformerDecoder(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=max(ctc_weight, 0.3))
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    ilens = jnp.array([T])
    ys = jnp.asarray(rng.randint(1, V - 1, size=(B, 3)).astype(np.int32))
    ylens = jnp.array([3])
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, ys, ylens)
    hs, hlens = model.apply(variables, feats, ilens, method="encode")
    ctc_logp = model.apply(variables, hs, method="ctc_log_softmax")
    dec_vars = {"params": variables["params"]["decoder"]}
    return model, dec, dec_vars, hs, hlens, ctc_logp


def _att_logp_fn(dec, dec_vars, hs, hlens):
    """Sequence log-prob under the decoder (teacher forced)."""

    def fn(seq):
        sos = eos = V - 1
        ys_in = jnp.array([[sos] + list(seq)])
        logits = dec.apply(dec_vars, hs, hlens, ys_in, None)
        logp = jax.nn.log_softmax(logits, axis=-1)[0]
        total = 0.0
        for i, tok in enumerate(list(seq) + [eos]):
            total += float(logp[i, tok])
        return total

    return fn


def _exhaustive_best(score_fn, maxlen=3):
    best, best_score = None, -np.inf
    for n in range(1, maxlen + 1):
        for seq in itertools.product(range(1, V - 1), repeat=n):
            s = score_fn(seq)
            if s > best_score:
                best, best_score = seq, s
    return best, best_score


@pytest.mark.slow
def test_beam_matches_exhaustive_attention_only():
    model, dec, dec_vars, hs, hlens, _ = _setup(seed=0)
    att_fn = _att_logp_fn(dec, dec_vars, hs, hlens)
    expect_seq, expect_score = _exhaustive_best(att_fn, maxlen=3)

    bs = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 1.0)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=9, ctc_weight=0.0,
    )
    yseq, ylen, scores = bs(hs, hlens, maxlen=3, minlen=1)
    got = [int(x) for x in np.asarray(yseq[0, 0])[1: int(ylen[0, 0]) - 1]]
    assert tuple(got) == expect_seq, (got, expect_seq)
    np.testing.assert_allclose(float(scores[0, 0]), expect_score, rtol=1e-4)


@pytest.mark.slow
def test_beam_matches_exhaustive_joint_ctc():
    model, dec, dec_vars, hs, hlens, ctc_logp = _setup(seed=3, ctc_weight=0.5)
    att_fn = _att_logp_fn(dec, dec_vars, hs, hlens)
    probs = np.exp(np.asarray(ctc_logp[0], dtype=np.float64))

    def joint_fn(seq):
        att = att_fn(seq)
        # ctc score of ended hyp = log P(output == seq)
        bf = brute_force_scores(probs, list(seq), eos=V - 1)
        p_exact = bf[V - 1]
        ctc = np.log(max(p_exact, 1e-300))
        return 0.7 * att + 0.3 * ctc

    expect_seq, expect_score = _exhaustive_best(joint_fn, maxlen=3)

    bs = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 0.7)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=9, ctc_weight=0.3,
        pre_beam_size=4,
    )
    yseq, ylen, scores = bs(hs, hlens, ctc_logp=ctc_logp, maxlen=3, minlen=1)
    got = [int(x) for x in np.asarray(yseq[0, 0])[1: int(ylen[0, 0]) - 1]]
    assert tuple(got) == expect_seq, (got, expect_seq)
    np.testing.assert_allclose(float(scores[0, 0]), expect_score, rtol=1e-3)


def test_beam_search_jit_and_batch():
    model, dec, dec_vars, hs, hlens, ctc_logp = _setup(seed=5)
    hs2 = jnp.concatenate([hs, hs * 0.9], axis=0)
    hlens2 = jnp.array([T, T - 2])
    ctc2 = jnp.concatenate([ctc_logp, ctc_logp], axis=0)
    bs = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 0.7)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=4, ctc_weight=0.3,
    )
    f = jax.jit(lambda m, ml, c: bs(m, ml, ctc_logp=c, maxlen=4))
    yseq, ylen, scores = f(hs2, hlens2, ctc2)
    assert yseq.shape[0] == 2 and yseq.shape[1] == 4
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()  # sorted best-first
    for b in range(2):
        y = np.asarray(yseq[b, 0])
        assert y[0] == V - 1 and y[int(ylen[b, 0]) - 1] == V - 1


def test_ctc_greedy_decode_matches_host():
    rng = np.random.RandomState(0)
    logp = jax.nn.log_softmax(jnp.asarray(rng.randn(3, 10, V).astype(np.float32)))
    tlens = jnp.array([10, 7, 1])
    ids, lens = ctc_greedy_decode(logp, tlens)
    host = ctc_greedy_decode_host(np.asarray(logp), np.asarray(tlens))
    for b in range(3):
        got = [int(x) for x in np.asarray(ids[b])[: int(lens[b])]]
        assert got == host[b]


def test_cached_transformer_lm_scorer_matches_stateless():
    """Beam search with the KV-cached transformer-LM scorer must produce
    the same hypotheses and scores as the stateless score_prefix scorer."""
    from espnet_tpu.models.lm.models import TransformerLM
    from espnet_tpu.search.scorers import (
        transformer_decoder_cached_scorer,
        transformer_lm_cached_scorer,
        transformer_lm_scorer,
    )

    model, dec, dec_vars, hs, hlens, ctc_logp = _setup(seed=3, ctc_weight=0.3)
    lm = TransformerLM(V, attention_dim=16, attention_heads=2,
                       linear_units=16, num_blocks=2)
    lm_vars = lm.init(jax.random.PRNGKey(7), np.zeros((1, 4), np.int32))

    outs = []
    for lm_scorer in (transformer_lm_scorer, transformer_lm_cached_scorer):
        bs = BeamSearch(
            {
                "decoder": transformer_decoder_cached_scorer(dec, dec_vars, 0.6),
                "lm": lm_scorer(lm, lm_vars, 0.4),
            },
            vocab_size=V, sos=V - 1, eos=V - 1, beam_size=3, ctc_weight=0.3,
        )
        outs.append(jax.jit(
            lambda h, hl, c, b=bs: b(h, hl, ctc_logp=c, maxlen=5)
        )(hs, hlens, ctc_logp))
    (y_a, l_a, s_a), (y_b, l_b, s_b) = outs
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), atol=1e-4)
