"""Look-ahead word LM: trie construction and telescoping property — the
accumulated char-level scores of a complete in-vocab word must equal the
word LM's log-prob relative to the subtree mass."""
import jax.numpy as jnp
import numpy as np

from espnet_tpu.text.multilevel_lm import WordTrie, lookahead_word_lm_scorer

TOKENS = ["<blank>", "<unk>", "<space>", "a", "b", "c", "<sos/eos>"]
WORDS = {"ab": np.log(0.5), "ac": np.log(0.3), "b": np.log(0.2)}


def _score_sequence(scorer, chars):
    """Drive the scorer over a char sequence (single hyp); returns the
    accumulated score of the chosen tokens."""
    t2i = {t: i for i, t in enumerate(TOKENS)}
    v = len(TOKENS)
    yseq = [t2i["<sos/eos>"]] + [t2i[c] for c in chars]
    yseq_arr = jnp.asarray(np.array([yseq + [0] * 3], np.int32))
    mem = jnp.zeros((1, 2, 4))
    state = scorer.call_init(scorer.params, mem, jnp.array([2]), 8)
    total = 0.0
    for pos in range(len(yseq) - 1):
        logp, state = scorer.call_score(scorer.params, state, yseq_arr, jnp.array([pos]))
        total += float(logp[0, yseq[pos + 1]])
    return total


def test_trie_subtree_mass():
    trie = WordTrie.build(WORDS, TOKENS)
    # root subtree mass = logsumexp of all word probs = log(1.0)
    np.testing.assert_allclose(float(trie.subtree_lse[0]), 0.0, atol=1e-5)


def test_word_score_telescopes():
    trie = WordTrie.build(WORDS, TOKENS)
    scorer = lookahead_word_lm_scorer(trie, TOKENS, 1.0)
    # "ab<space>": char scores + settle must total ln P("ab") − ln(total mass)
    got = _score_sequence(scorer, ["a", "b", "<space>"])
    np.testing.assert_allclose(got, WORDS["ab"], rtol=1e-4)
    got2 = _score_sequence(scorer, ["b", "<space>"])
    np.testing.assert_allclose(got2, WORDS["b"], rtol=1e-4)


def test_lookahead_prefers_likely_prefix():
    trie = WordTrie.build(WORDS, TOKENS)
    scorer = lookahead_word_lm_scorer(trie, TOKENS, 1.0)
    t2i = {t: i for i, t in enumerate(TOKENS)}
    yseq = jnp.asarray(np.array([[t2i["<sos/eos>"], 0, 0]], np.int32))
    mem = jnp.zeros((1, 2, 4))
    state = scorer.call_init(scorer.params, mem, jnp.array([2]), 4)
    logp, _ = scorer.call_score(scorer.params, state, yseq, jnp.array([0]))
    # P(a...) = 0.8 mass vs P(b...) = 0.2
    assert float(logp[0, t2i["a"]]) > float(logp[0, t2i["b"]])
    np.testing.assert_allclose(float(logp[0, t2i["a"]]), np.log(0.8), rtol=1e-4)


def test_oov_word_pays_unk_once():
    trie = WordTrie.build(WORDS, TOKENS, unk_logp=-7.0)
    scorer = lookahead_word_lm_scorer(trie, TOKENS, 1.0)
    got = _score_sequence(scorer, ["c", "c", "<space>"])
    np.testing.assert_allclose(got, -7.0, rtol=1e-4)
