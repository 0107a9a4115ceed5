"""Byte-pair-encoding tokenizer (own implementation).

Fills the role of the sentencepiece C++ dependency in the reference
(espnet2/text/sentencepiece_tokenizer.py, tools sentencepiece): classic
BPE over whitespace-split words with the "▁" word-boundary marker, so
tokens round-trip like sentencepiece's.

Model format: json {"merges": [[a,b],...], "vocab": [...]}.
"""
from __future__ import annotations

import json
from collections import Counter
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

WORD_MARK = "▁"  # ▁


def _word_to_symbols(word: str) -> Tuple[str, ...]:
    return tuple([WORD_MARK + word[0]] + list(word[1:])) if word else ()


class BPETokenizer:
    def __init__(self, merges: List[Tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks: Dict[Tuple[str, str], int] = {
            m: i for i, m in enumerate(self.merges)
        }
        self._cache: Dict[str, List[str]] = {}

    # -- train ---------------------------------------------------------
    @classmethod
    def train(cls, texts: Iterable[str], vocab_size: int = 1000) -> "BPETokenizer":
        word_freq = Counter()
        for line in texts:
            for w in line.split():
                word_freq[w] += 1
        words = {w: list(_word_to_symbols(w)) for w in word_freq}
        symbols = set()
        for syms in words.values():
            symbols.update(syms)
        merges: List[Tuple[str, str]] = []
        while len(symbols) + len(merges) < vocab_size:
            pairs = Counter()
            for w, syms in words.items():
                f = word_freq[w]
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            (a, b), freq = pairs.most_common(1)[0]
            if freq < 2:
                break
            merges.append((a, b))
            new = a + b
            for w, syms in words.items():
                i = 0
                out = []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(new)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return cls(merges)

    # -- encode/decode -------------------------------------------------
    def _encode_word(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        syms = list(_word_to_symbols(word))
        while len(syms) > 1:
            best, best_rank = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best: best + 2] = [syms[best] + syms[best + 1]]
        self._cache[word] = syms
        return syms

    def text2tokens(self, line: str) -> List[str]:
        out: List[str] = []
        for w in line.split():
            out.extend(self._encode_word(w))
        return out

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return "".join(tokens).replace(WORD_MARK, " ").strip()

    # -- persistence ---------------------------------------------------
    def vocab(self) -> List[str]:
        base = set()
        for a, b in self.merges:
            base.add(a)
            base.add(b)
            base.add(a + b)
        return sorted(base)

    def save(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(
            json.dumps({"merges": [list(m) for m in self.merges]})
        )

    @classmethod
    def load(cls, path) -> "BPETokenizer":
        d = json.loads(Path(path).read_text())
        return cls([tuple(m) for m in d["merges"]])
