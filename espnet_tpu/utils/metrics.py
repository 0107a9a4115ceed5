"""Edit-distance scoring: CER/WER (reference: e2e_asr_common.py
ErrorCalculator:103; sclite scoring utils/score_sclite.sh).

Pure-python DP with numpy rows; a C ext (espnet_tpu.native.editdistance)
is used when built. Also emits sclite-style per-utterance reports.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance."""
    try:
        from espnet_tpu.native import editdistance as _ed

        return _ed.distance(list(ref), list(hyp))
    except Exception:
        pass
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ref[i - 1] != hyp[j - 1]),
            )
        prev = cur
    return int(prev[m])


def align_ops(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """(correct, substitutions, deletions, insertions) via DP backtrace."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), dtype=np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
            )
    i, j = n, m
    c = s = dele = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            if ref[i - 1] == hyp[j - 1]:
                c += 1
            else:
                s += 1
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            dele += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return c, s, dele, ins


class ErrorCalculator:
    """CER/WER between id sequences (ErrorCalculator:103)."""

    def __init__(
        self,
        token_list: List[str],
        space_symbol: str = "<space>",
        ignore_ids: Iterable[int] = (-1,),
    ):
        self.token_list = token_list
        self.space = space_symbol
        self.ignore = set(ignore_ids)

    def ids2text(self, ids: Sequence[int]) -> str:
        toks = [self.token_list[i] for i in ids if i not in self.ignore and 0 <= i < len(self.token_list)]
        return "".join(" " if t == self.space else t for t in toks)

    def cer(self, refs: List[Sequence[int]], hyps: List[Sequence[int]]) -> float:
        dist = total = 0
        for r, h in zip(refs, hyps):
            rt = self.ids2text(r).replace(" ", "")
            ht = self.ids2text(h).replace(" ", "")
            dist += edit_distance(rt, ht)
            total += len(rt)
        return dist / max(total, 1)

    def wer(self, refs: List[Sequence[int]], hyps: List[Sequence[int]]) -> float:
        dist = total = 0
        for r, h in zip(refs, hyps):
            rw = self.ids2text(r).split()
            hw = self.ids2text(h).split()
            dist += edit_distance(rw, hw)
            total += len(rw)
        return dist / max(total, 1)


def sclite_report(
    results: Dict[str, Tuple[List[str], List[str]]]
) -> str:
    """Per-utterance + total Err report in sclite result.txt spirit
    (score_sclite.sh output consumed by RESULTS.md)."""
    lines = []
    C = S = D = I = 0
    for uid, (ref, hyp) in sorted(results.items()):
        c, s, d, ins = align_ops(ref, hyp)
        C, S, D, I = C + c, S + s, D + d, I + ins
        n = max(len(ref), 1)
        lines.append(
            f"id: ({uid}) C={c} S={s} D={d} I={ins} Err={100.0*(s+d+ins)/n:.2f}%"
        )
    n = max(C + S + D, 1)
    lines.append(
        f"| Sum | Corr={C} Sub={S} Del={D} Ins={I} "
        f"Err={100.0*(S+D+I)/n:.2f}% S.Err |"
    )
    return "\n".join(lines)


def model_summary(params) -> str:
    """Parameter-count summary (reference: espnet2/torch_utils/model_summary.py)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0
    lines = []
    for path, leaf in leaves:
        import numpy as _np

        n = int(_np.prod(_np.shape(leaf))) if _np.ndim(leaf) else 1
        total += n
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        lines.append(f"{name}: {tuple(_np.shape(leaf))} = {n:,}")
    lines.append(f"Total parameters: {total:,} ({total * 4 / 1e6:.1f} MB f32)")
    return "\n".join(lines)


def bleu(refs, hyps, max_n: int = 4) -> float:
    """Corpus BLEU (uniform n-gram weights, brevity penalty) — the
    reference reports BLEU for MT/ST via multi-bleu/sacrebleu."""
    import math
    from collections import Counter

    def ngrams(seq, n):
        return Counter(tuple(seq[i: i + n]) for i in range(len(seq) - n + 1))

    max_n = max(1, min(max_n, max((len(h) for h in hyps), default=1),
                       max((len(r) for r in refs), default=1)))
    log_precisions = []
    for n in range(1, max_n + 1):
        match = total = 0
        for ref, hyp in zip(refs, hyps):
            h = ngrams(hyp, n)
            r = ngrams(ref, n)
            match += sum(min(c, r[g]) for g, c in h.items())
            total += max(sum(h.values()), 0)
        if total == 0 or match == 0:
            return 0.0
        log_precisions.append(math.log(match / total))
    ref_len = sum(len(r) for r in refs)
    hyp_len = sum(len(h) for h in hyps)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return bp * math.exp(sum(log_precisions) / max_n)


def tokenize_13a(text: str):
    """mteval-v13a / sacrebleu "13a" international tokenization — the
    convention the reference's multi-bleu/sacrebleu scoring applies to
    detokenized MT/ST output (reference: utils/score_bleu.sh via moses).
    Returns the token list for bleu()."""
    import re

    text = text.replace("<skipped>", "")
    text = text.replace("-\n", "").replace("\n", " ")
    text = (
        text.replace("&quot;", '"')
        .replace("&amp;", "&")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    )
    text = f" {text} "
    # pad all non-alphanumeric-ish symbols
    text = re.sub(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])", r" \1 ", text)
    # period/comma not adjacent to digits
    text = re.sub(r"([^0-9])([\.,])", r"\1 \2 ", text)
    text = re.sub(r"([\.,])([^0-9])", r" \1 \2", text)
    # dash after a digit
    text = re.sub(r"([0-9])(-)", r"\1 \2 ", text)
    return text.split()
