"""Look-ahead word LM for character-level decoding (reference:
espnet/lm/pytorch_backend/extlm.py — MultiLevelLM, LookAheadWordLM; used
via asr.py:956-967 for word-LM fusion during char beam search).

TPU redesign: the reference walks a python dict trie per hypothesis; here
the word vocabulary is compiled into DENSE trie tensors once —
    children[node, char] → next node (or -1)
    subtree_lse[node]    → logsumexp of word log-probs below node
    word_logp[node]      → log-prob if node completes a word (else -inf)
and the scorer is pure gathers: per step, advance each hypothesis's node
with its last character and emit the look-ahead distribution
    score(c | node) = subtree_lse[children[node, c]] − subtree_lse[node]
with the word probability settled exactly at word boundaries (<space> /
eos), so the accumulated score of a finished word telescopes to the word
LM's log-prob (OOV → unk penalty). Fully jittable beam-search state =
one int32 node id per hypothesis.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

NEG_INF = -1.0e10


class WordTrie:
    """Dense-tensor prefix trie over a word unigram LM."""

    def __init__(self, children, subtree_lse, word_logp, char2id, unk_logp):
        self.children = children        # (N, C) int32
        self.subtree_lse = subtree_lse  # (N,) float32
        self.word_logp = word_logp      # (N,) float32
        self.char2id = char2id
        self.unk_logp = unk_logp

    @classmethod
    def build(
        cls,
        word_logps: Dict[str, float],   # word → ln prob (unigram word LM)
        token_list: List[str],          # char tokens (beam-search vocab)
        unk_logp: float = -20.0,
    ) -> "WordTrie":
        char2id = {t: i for i, t in enumerate(token_list)}
        c = len(token_list)
        children: List[List[int]] = [[-1] * c]
        sums: List[List[float]] = [[]]
        word_lp: List[float] = [NEG_INF]

        def logaddexp(vals):
            if not vals:
                return NEG_INF
            m = max(vals)
            return m + float(np.log(sum(np.exp(np.asarray(vals) - m))))

        for word, lp in word_logps.items():
            node = 0
            ok = True
            for ch in word:
                if ch not in char2id:
                    ok = False
                    break
                cid = char2id[ch]
                nxt = children[node][cid]
                if nxt == -1:
                    nxt = len(children)
                    children[node][cid] = nxt
                    children.append([-1] * c)
                    sums.append([])
                    word_lp.append(NEG_INF)
                node = nxt
            if ok:
                word_lp[node] = lp

        # subtree logsumexp via reverse topological pass (children have
        # larger ids than parents by construction)
        n = len(children)
        subtree = [NEG_INF] * n
        for node in range(n - 1, -1, -1):
            vals = [word_lp[node]] if word_lp[node] > NEG_INF / 2 else []
            for cid in range(c):
                nxt = children[node][cid]
                if nxt != -1 and subtree[nxt] > NEG_INF / 2:
                    vals.append(subtree[nxt])
            subtree[node] = logaddexp(vals)

        return cls(
            np.asarray(children, np.int32),
            np.asarray(subtree, np.float32),
            np.asarray(word_lp, np.float32),
            char2id,
            unk_logp,
        )


def lookahead_word_lm_scorer(
    trie: WordTrie,
    token_list: List[str],
    weight: float,
    space_symbol: str = "<space>",
):
    """FullScorer: look-ahead word-LM fusion for char-level beam search.

    State: (node (N,), in_unk (N,)) — current trie position per hyp;
    in_unk marks hyps inside an out-of-vocabulary word (flat unk score
    already paid at the first unmatched char).
    """
    import jax
    import jax.numpy as jnp

    from espnet_tpu.search.beam_search import FullScorer

    v = len(token_list)
    space_id = token_list.index(space_symbol) if space_symbol in token_list else -1
    eos_id = v - 1
    trie_params = {
        "children": jnp.asarray(trie.children),
        "subtree": jnp.asarray(trie.subtree_lse),
        "word_lp": jnp.asarray(trie.word_logp),
    }
    unk = trie.unk_logp

    char_ids = jnp.arange(v)
    is_boundary = (char_ids == space_id) | (char_ids == eos_id)

    def init(params, mem, mem_lens, maxlen=None):
        n = mem.shape[0]
        return (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))

    def score(params, state, yseq, pos):
        children = params["children"]
        subtree = params["subtree"]
        word_lp = params["word_lp"]
        node, in_unk = state
        last = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]  # (N,)
        sos = eos_id  # sos==eos convention; at step 0 last==sos → stay at root

        # --- advance node with the last emitted char -------------------
        is_char = (last != sos) & ~((last == space_id) | (last == eos_id))
        nxt = children[node, jnp.clip(last, 0, v - 1)]  # (N,)
        entered_unk = is_char & (nxt == -1) & ~in_unk
        new_in_unk = jnp.where(is_char, in_unk | (nxt == -1), False)
        new_node = jnp.where(
            is_char, jnp.where(nxt == -1, node, nxt), 0
        )  # boundary/sos resets to root
        # while inside an unk word, the node stays put
        new_node = jnp.where(in_unk & is_char, node, new_node)

        # --- emit look-ahead scores for every candidate next token -----
        ch = children[new_node]  # (N, V)
        denom = subtree[new_node][:, None]  # (N, 1)
        child_lse = jnp.where(ch >= 0, subtree[jnp.clip(ch, 0)], NEG_INF)
        char_scores = child_lse - denom  # in-vocab continuation
        # first char of an OOV word pays the unk penalty; inside unk: 0
        char_scores = jnp.where(char_scores > NEG_INF / 2, char_scores, unk)
        char_scores = jnp.where(new_in_unk[:, None], 0.0, char_scores)
        # boundary tokens settle the word: word_logp[node] − subtree[node]
        settle = (word_lp[new_node] - subtree[new_node])[:, None]
        settle = jnp.where(new_in_unk[:, None], 0.0, settle)
        # at root (no word in progress) a boundary costs nothing
        at_root = (new_node == 0)[:, None]
        boundary_scores = jnp.where(at_root, 0.0, settle)
        logp = jnp.where(is_boundary[None, :], boundary_scores, char_scores)
        return logp, (new_node, new_in_unk)

    return FullScorer(weight, init, score, params=trie_params)
