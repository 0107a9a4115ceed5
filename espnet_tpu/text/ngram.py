"""N-gram LM: ARPA parsing + shallow-fusion scorer
(reference: espnet/nets/scorers/ngram.py via the kenlm C++ lib).

Own ARPA implementation (no kenlm): full backoff scoring on the host,
plus a dense-tensor fusion scorer for the jitted beam search — token-id
n-gram scores materialised as arrays (unigram (V,), bigram (V, V);
higher orders back off), which is exact for order ≤ 2 and a backoff
approximation above.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LOG10 = math.log(10.0)


class ArpaLM:
    """Backoff n-gram LM parsed from ARPA text."""

    def __init__(self, ngrams: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]]):
        self.ngrams = ngrams  # order -> {tuple(words): (logp_e, backoff_e)}
        self.order = max(ngrams) if ngrams else 0

    @classmethod
    def load(cls, path) -> "ArpaLM":
        ngrams: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]] = {}
        cur: Optional[int] = None
        for raw in Path(path).read_text().splitlines():
            line = raw.strip()
            if not line or line.startswith("\\data\\") or line.startswith("ngram "):
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                cur = int(line[1:].split("-")[0])
                ngrams[cur] = {}
                continue
            if line.startswith("\\end\\"):
                break
            if cur is None:
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                parts = line.split()
                if len(parts) < cur + 1:
                    continue
                logp = float(parts[0])
                words = tuple(parts[1: 1 + cur])
                bo = float(parts[1 + cur]) if len(parts) > 1 + cur else 0.0
            else:
                logp = float(parts[0])
                words = tuple(parts[1].split())
                bo = float(parts[2]) if len(parts) > 2 else 0.0
            ngrams[cur][words] = (logp * LOG10, bo * LOG10)
        return cls(ngrams)

    def score(self, context: Sequence[str], word: str) -> float:
        """ln P(word | context) with standard backoff."""
        ctx = tuple(context)[-(self.order - 1):] if self.order > 1 else ()
        return self._score(ctx, word)

    def _score(self, ctx: Tuple[str, ...], word: str) -> float:
        gram = ctx + (word,)
        entry = self.ngrams.get(len(gram), {}).get(gram)
        if entry is not None:
            return entry[0]
        if not ctx:
            unk = self.ngrams.get(1, {}).get(("<unk>",))
            return unk[0] if unk else -20.0
        bo_entry = self.ngrams.get(len(ctx), {}).get(ctx)
        bo = bo_entry[1] if bo_entry else 0.0
        return bo + self._score(ctx[1:], word)

    def sentence_logprob(self, words: Sequence[str]) -> float:
        ctx: List[str] = ["<s>"]
        total = 0.0
        for w in list(words) + ["</s>"]:
            total += self.score(ctx, w)
            ctx.append(w)
        return total


def dense_bigram_tables(
    lm: ArpaLM, token_list: List[str], sos_symbol: str = "<s>"
) -> Tuple[np.ndarray, np.ndarray]:
    """(unigram (V,), bigram (V, V)) ln-prob tables with backoff applied.

    bigram[i, j] = ln P(token_j | token_i); row for sos uses <s> context.
    """
    v = len(token_list)
    uni = np.full(v, -20.0, dtype=np.float32)
    for j, tok in enumerate(token_list):
        e = lm.ngrams.get(1, {}).get((tok,))
        if e is not None:
            uni[j] = e[0]
    bi = np.tile(uni[None, :], (v, 1))
    for i, ci in enumerate(token_list):
        ctx = (sos_symbol,) if ci in ("<sos/eos>", "<s>") else (ci,)
        bo_entry = lm.ngrams.get(1, {}).get(ctx)
        bo = bo_entry[1] if bo_entry else 0.0
        for j, tok in enumerate(token_list):
            e = lm.ngrams.get(2, {}).get(ctx + (tok,))
            bi[i, j] = e[0] if e is not None else bo + uni[j]
    return uni, bi


def ngram_scorer(lm: ArpaLM, token_list: List[str], weight: float):
    """FullScorer for the jitted beam search using dense bigram tables."""
    import jax.numpy as jnp

    from espnet_tpu.search.beam_search import FullScorer

    _, bi = dense_bigram_tables(lm, token_list)
    bi_t = jnp.asarray(bi)

    def init(mem, mem_lens, maxlen=None):
        return ()

    def score(state, yseq, pos):
        last = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]  # (N,)
        return bi_t[last], state

    return FullScorer(weight, init, score)
