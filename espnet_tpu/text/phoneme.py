"""Phoneme tokenizer + grapheme-to-phoneme (reference:
espnet2/text/phoneme_tokenizer.py PhonemeTokenizer, which plugs g2p_en /
pyopenjtalk; both are external packages unavailable here).

TPU-build design: G2P is host-side text preprocessing, so it stays pure
Python. Two g2p backends:

  * ``lexicon:<path>``  — CMUdict-format dictionary lookup (``WORD  PH ...``,
    ``WORD(2)`` alternates ignored, trailing stress digits stripped), with
    rule fallback for OOV words. The AN4 corpus ships such a lexicon
    (downloads/an4/etc/an4.dic).
  * ``en_rule``         — deterministic greedy longest-match English
    letter-to-sound rules producing ARPAbet (no stress). Not g2p_en-exact,
    but a real standalone g2p covering common orthography.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional

# Greedy longest-match English LTS rules: (grapheme, phones).
# Checked in order of decreasing grapheme length at each position.
_LTS_RULES: List[tuple] = [
    ("tion", ["SH", "AH", "N"]),
    ("sion", ["ZH", "AH", "N"]),
    ("ough", ["AO"]),
    ("augh", ["AE", "F"]),
    ("eigh", ["EY"]),
    ("igh", ["AY"]),
    ("tch", ["CH"]),
    ("dge", ["JH"]),
    ("sch", ["S", "K"]),
    ("ing", ["IH", "NG"]),
    ("qu", ["K", "W"]),
    ("ch", ["CH"]),
    ("sh", ["SH"]),
    ("th", ["TH"]),
    ("ph", ["F"]),
    ("wh", ["W"]),
    ("ck", ["K"]),
    ("ng", ["NG"]),
    ("kn", ["N"]),
    ("wr", ["R"]),
    ("ee", ["IY"]),
    ("ea", ["IY"]),
    ("oo", ["UW"]),
    ("ou", ["AW"]),
    ("ow", ["OW"]),
    ("oi", ["OY"]),
    ("oy", ["OY"]),
    ("ay", ["EY"]),
    ("ai", ["EY"]),
    ("au", ["AO"]),
    ("aw", ["AO"]),
    ("ar", ["AA", "R"]),
    ("er", ["ER"]),
    ("ir", ["ER"]),
    ("ur", ["ER"]),
    ("or", ["AO", "R"]),
    ("oa", ["OW"]),
    ("ie", ["IY"]),
    ("ei", ["EY"]),
    ("ey", ["IY"]),
    ("ue", ["UW"]),
    ("ui", ["UW"]),
    ("a", ["AE"]),
    ("b", ["B"]),
    ("c", ["K"]),
    ("d", ["D"]),
    ("e", ["EH"]),
    ("f", ["F"]),
    ("g", ["G"]),
    ("h", ["HH"]),
    ("i", ["IH"]),
    ("j", ["JH"]),
    ("k", ["K"]),
    ("l", ["L"]),
    ("m", ["M"]),
    ("n", ["N"]),
    ("o", ["AA"]),
    ("p", ["P"]),
    ("q", ["K"]),
    ("r", ["R"]),
    ("s", ["S"]),
    ("t", ["T"]),
    ("u", ["AH"]),
    ("v", ["V"]),
    ("w", ["W"]),
    ("x", ["K", "S"]),
    ("y", ["Y"]),
    ("z", ["Z"]),
]
_MAX_RULE = max(len(g) for g, _ in _LTS_RULES)
_RULEMAP = {g: p for g, p in _LTS_RULES}


def rule_g2p_word(word: str) -> List[str]:
    """Greedy longest-match letter-to-sound for one lowercase word."""
    word = word.lower()
    # soft c/g and silent final e heuristics
    if word.endswith("e") and len(word) > 3 and word[-2] not in "aeiou":
        word = word[:-1]
    phones: List[str] = []
    i = 0
    while i < len(word):
        for n in range(min(_MAX_RULE, len(word) - i), 0, -1):
            sub = word[i : i + n]
            if sub in _RULEMAP:
                p = _RULEMAP[sub]
                # soft c before e/i/y → S; soft g before e/i/y → JH
                if sub == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
                    p = ["S"]
                elif sub == "g" and i + 1 < len(word) and word[i + 1] in "eiy":
                    p = ["JH"]
                phones.extend(p)
                i += n
                break
        else:
            i += 1  # skip unknown char
    return phones


_STRESS_RE = re.compile(r"\d+$")


def read_lexicon(path) -> Dict[str, List[str]]:
    """CMUdict-format lexicon: 'WORD  PH1 PH2 ...'; '(n)' alternates and
    trailing stress digits dropped; comment lines (;;;) skipped."""
    lex: Dict[str, List[str]] = {}
    for line in Path(path).read_text(errors="replace").splitlines():
        line = line.strip()
        if not line or line.startswith(";;;"):
            continue
        parts = line.split()
        word = parts[0]
        if "(" in word:  # alternate pronunciation — keep first only
            continue
        lex[word.upper()] = [_STRESS_RE.sub("", p) for p in parts[1:]]
    return lex


class PhonemeTokenizer:
    """text → phoneme tokens (espnet2/text/phoneme_tokenizer.py).

    g2p_type: 'en_rule' or 'lexicon:<path>'. Word boundaries become
    `space_symbol` when keep_word_sep, matching the reference's
    g2p-with-space variants.
    """

    def __init__(
        self,
        g2p_type: str = "en_rule",
        space_symbol: str = "<space>",
        keep_word_sep: bool = False,
        non_linguistic_symbols: Iterable[str] = (),
    ):
        self.g2p_type = g2p_type
        self.space_symbol = space_symbol
        self.keep_word_sep = keep_word_sep
        self.nls = set(non_linguistic_symbols)
        self.lexicon: Optional[Dict[str, List[str]]] = None
        if g2p_type.startswith("lexicon:"):
            self.lexicon = read_lexicon(g2p_type.split(":", 1)[1])
        elif g2p_type != "en_rule":
            raise ValueError(f"unknown g2p_type {g2p_type}")

    def word2phones(self, word: str) -> List[str]:
        if word in self.nls:
            return [word]
        if self.lexicon is not None:
            hit = self.lexicon.get(word.upper())
            if hit is not None:
                return list(hit)
        return rule_g2p_word(word)

    def text2tokens(self, line: str) -> List[str]:
        out: List[str] = []
        words = [w for w in re.split(r"\s+", line.strip()) if w]
        for i, w in enumerate(words):
            if i > 0 and self.keep_word_sep:
                out.append(self.space_symbol)
            out.extend(self.word2phones(w))
        return out

    def tokens2text(self, tokens: Iterable[str]) -> str:
        # phonemes are not invertible; join for display
        return " ".join(tokens)
