"""Text cleaners (reference: espnet2/text/cleaner.py TextCleaner, which
wraps tacotron_cleaner.cleaners.custom_english_cleaners).

Self-contained English tacotron cleaning: unicode NFKD → ascii, expand
abbreviations, expand numbers to words, uppercase, collapse whitespace,
strip characters outside [A-Z '.,!?-].
"""
from __future__ import annotations

import re
import unicodedata
from typing import Iterable, List, Optional

_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
         "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
         "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand"),
          (100, "hundred")]


def number_to_words(n: int) -> str:
    """Integer → English words (replaces the inflect dependency)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, o = divmod(n, 10)
        return _TENS[t] + ("" if o == 0 else " " + _ONES[o])
    for base, name in _SCALE:
        if n >= base:
            q, r = divmod(n, base)
            head = f"{number_to_words(q)} {name}"
            return head if r == 0 else f"{head} {number_to_words(r)}"
    return _ONES[0]


def _expand_number(m) -> str:
    s = (m if isinstance(m, str) else m.group(0)).replace(",", "")
    if "." in s:
        intpart, frac = s.split(".", 1)
        words = number_to_words(int(intpart)) if intpart else ""
        digits = " ".join(_ONES[int(d)] for d in frac if d.isdigit())
        return f"{words} point {digits}".strip()
    n = int(s)
    # year-style reading for 1100-1999 / 2010-2099 (e.g. 1928 → nineteen twenty eight)
    if 1100 <= n < 2000 or 2010 <= n < 2100:
        hi, lo = divmod(n, 100)
        if lo == 0:
            return f"{number_to_words(hi)} hundred"
        return f"{number_to_words(hi)} {number_to_words(lo)}"
    return number_to_words(n)


_NUM_RE = re.compile(r"\d[\d,]*(?:\.\d+)?")
_DOLLAR_RE = re.compile(r"\$(\d[\d,]*(?:\.\d+)?)")
_ORDINAL_RE = re.compile(r"\b(\d+)(st|nd|rd|th)\b", re.IGNORECASE)

_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _ordinal_words(n: int) -> str:
    words = number_to_words(n).split()
    last = words[-1]
    if last in _ORDINAL_SPECIAL:
        words[-1] = _ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    else:
        words[-1] = last + "th"
    return " ".join(words)


def custom_english_cleaners(text: str) -> str:
    """Tacotron-style English cleaning (uppercased output, reference
    tacotron_cleaner convention used by egs/ljspeech/tts1)."""
    text = unicodedata.normalize("NFKD", text)
    text = text.encode("ascii", "ignore").decode("ascii")
    for pat, full in _ABBREVIATIONS:
        text = pat.sub(full, text)
    text = _DOLLAR_RE.sub(lambda m: _expand_number(m.group(1)) + " dollars", text)
    text = _ORDINAL_RE.sub(lambda m: _ordinal_words(int(m.group(1))), text)
    text = _NUM_RE.sub(_expand_number, text)
    text = text.upper()
    text = re.sub(r"[^A-Z '.,!?\-]", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


class TextCleaner:
    """Apply a chain of named cleaners (espnet2/text/cleaner.py)."""

    CLEANERS = {"tacotron": custom_english_cleaners}

    def __init__(self, cleaner_types: Optional[Iterable[str]] = None):
        names: List[str] = list(cleaner_types or [])
        for n in names:
            if n not in self.CLEANERS:
                raise ValueError(f"unknown cleaner {n}")
        self.names = names

    def __call__(self, text: str) -> str:
        for n in self.names:
            text = self.CLEANERS[n](text)
        return text
