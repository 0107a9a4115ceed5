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

    def init(params, mem, mem_lens, maxlen=None):
        return ()

    def score(params, state, yseq, pos):
        last = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]  # (N,)
        return params[last], state

    return FullScorer(weight, init, score, params=bi_t)


def _encode_keys(ids: "np.ndarray", v: int) -> "np.ndarray":
    """Row-wise positional encoding of token-id tuples into int64 keys
    (base V+1, ids shifted by 1 so 0 can pad short contexts)."""
    import numpy as np

    base = v + 1
    keys = np.zeros(len(ids), dtype=np.int64)
    for col in range(ids.shape[1]):
        keys = keys * base + (ids[:, col] + 1)
    return keys


def build_ngram_tables(lm: ArpaLM, token_list: List[str], sos_symbol="<sos/eos>"):
    """ARPA n-grams → per-order sorted (keys, logp, backoff) arrays for
    exact jitted lookup at ANY order (reference scorers/ngram.py:12 uses
    kenlm C++; here the tables live on device and are probed with
    jnp.searchsorted under jit)."""
    import numpy as np

    v = len(token_list)
    tok2id = {t: i for i, t in enumerate(token_list)}
    # "<s>" gets the RESERVED internal id v (context-only — it is never a
    # prediction target, but its unigram entry carries the start-context
    # backoff weight); "</s>" maps to the decoder's eos token so target
    # queries find the end-of-sentence probability. Collapsing both onto
    # one id collides their unigram entries.
    sos_ctx_id = v

    def wid(w):
        if w == "<s>":
            return sos_ctx_id
        if w == "</s>":
            return tok2id.get(sos_symbol, 0)
        return tok2id.get(w, tok2id.get("<unk>", 0))

    tables = {}
    for order, grams in lm.ngrams.items():
        ids = np.zeros((len(grams), order), dtype=np.int64)
        logp = np.zeros(len(grams), dtype=np.float32)
        bo = np.zeros(len(grams), dtype=np.float32)
        for row, (words, (lp, b)) in enumerate(grams.items()):
            for col, w in enumerate(words):
                ids[row, col] = wid(w)
            logp[row] = lp
            bo[row] = b
        keys = _encode_keys(ids, v + 1)  # base v+2: ids go up to v
        order_idx = np.argsort(keys, kind="stable")
        # duplicate keys possible (<s>/</s> both map to sos); keep first
        keys_s = keys[order_idx]
        keep = np.ones(len(keys_s), bool)
        keep[1:] = keys_s[1:] != keys_s[:-1]
        tables[order] = (
            keys_s[keep],
            logp[order_idx][keep],
            bo[order_idx][keep],
        )
    return tables, v


def ngram_full_scorer(
    lm: ArpaLM, token_list: List[str], weight: float, sos_symbol="<sos/eos>"
):
    """FullScorer with EXACT arbitrary-order backoff inside the jitted
    beam search: for each hypothesis, the last (K-1) tokens form the
    context; scores for all V successors resolve highest-order-first with
    ARPA backoff, each order one sorted-array probe (searchsorted)."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.search.beam_search import FullScorer

    tables, v = build_ngram_tables(lm, token_list, sos_symbol)
    k_max = max(tables)
    base = v + 2  # ids 0..v (v = reserved "<s>" context id), +1 shift
    dev = {
        o: tuple(jnp.asarray(a) for a in tables[o]) for o in tables
    }
    sos_id = token_list.index(sos_symbol) if sos_symbol in token_list else 0

    def probe(tables_dev, order, keys_q):
        """keys_q (...,) int64 → (logp, backoff, found)."""
        keys, logp, bo = tables_dev[order]
        idx = jnp.searchsorted(keys, keys_q)
        idx_c = jnp.minimum(idx, len(keys) - 1)
        found = keys[idx_c] == keys_q
        return (
            jnp.where(found, logp[idx_c], 0.0),
            jnp.where(found, bo[idx_c], 0.0),
            found,
        )

    def init(params, mem, mem_lens, maxlen=None):
        return ()

    def score(params, state, yseq, pos):
        # yseq (N, L) with yseq[:,0] = sos; pos (N,) index of last token
        n, l = yseq.shape
        # context = last (k_max-1) tokens (right-aligned, 0-padded via
        # the +1 shift in encoding; absent positions encode as 0)
        ctx_enc = jnp.zeros((n,), jnp.int64)
        valid_ctx = jnp.zeros((n,), jnp.int64)  # number of usable ctx toks
        words = jnp.arange(v, dtype=jnp.int64)[None, :]  # (1, V)

        # encode the full (k_max-1)-token context base-(V+1)
        for back in range(k_max - 1, 0, -1):
            idx = pos - back + 1  # token position in yseq
            tok = jnp.take_along_axis(
                yseq, jnp.maximum(idx, 0)[:, None], axis=1
            )[:, 0].astype(jnp.int64)
            # the hypothesis starts with the decoder sos token — in LM
            # space that is the "<s>" context (reserved id v)
            tok = jnp.where(tok == sos_id, v, tok)
            have = idx >= 0
            ctx_enc = jnp.where(
                have, ctx_enc * base + (tok + 1), ctx_enc
            )
            valid_ctx = valid_ctx + have.astype(jnp.int64)

        # resolve highest order first with backoff accumulation
        out = jnp.zeros((n, v), jnp.float32)
        resolved = jnp.zeros((n, v), bool)
        bo_acc = jnp.zeros((n,), jnp.float32)
        ctx = ctx_enc
        for order in range(k_max, 0, -1):
            clen = order - 1
            usable = valid_ctx >= clen
            if order in dev:
                q = ctx[:, None] * base + (words + 1)  # (N, V)
                lp, _, found = probe(params, order, q)
                take = found & usable[:, None] & ~resolved
                out = jnp.where(take, lp + bo_acc[:, None], out)
                resolved = resolved | take
                # backoff weight of THIS context for the next-lower order
                if clen >= 1 and clen in dev:
                    _, bo_c, bo_found = probe(params, clen, ctx)
                    bo_acc = bo_acc + jnp.where(
                        bo_found & usable, bo_c, 0.0
                    )
            # drop the oldest context token: ctx mod base^(clen-1)
            if clen >= 1:
                ctx = ctx % (base ** (clen - 1)) if clen > 1 else jnp.zeros_like(ctx)
        out = jnp.where(resolved, out, -20.0 + bo_acc[:, None])  # OOV floor
        return out, state

    return FullScorer(weight, init, score, params=dev)
