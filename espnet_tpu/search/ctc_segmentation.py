"""CTC segmentation: align known utterance texts within LONG audio.

Native re-implementation of the algorithm behind the reference's
`espnet/bin/asr_align.py:228` (Kürzinger et al., "CTC-Segmentation of
Large Corpora for German End-to-end Speech Recognition" — the reference
delegates to the external `ctc_segmentation` package; here the DP is
implemented directly):

- build the standard CTC extended state sequence (blank-interleaved)
  over the CONCATENATED utterance token sequences;
- Viterbi forward over the CTC log-posteriors where the leading blank
  state is free at every frame (the text may start anywhere in the
  audio) and the trailing blank absorbs the tail;
- optional `gratis_blank`: blank transitions cost nothing, so long
  non-speech gaps BETWEEN utterances don't drag scores down;
- a diagonal band over states bounds memory to O(T·band) so hour-scale
  audio aligns without a T×S table;
- per-utterance (start, end, confidence): confidence is the minimum
  per-token score within the utterance, where a token's score is the
  max log-posterior it attained over its aligned frames (the package's
  char-probability convention).

The CTC posteriors come from the device (encoder + ctc_log_softmax);
this DP is offline host-side tooling, vectorized numpy over the band —
the same split as the reference (GPU posteriors + compiled CPU DP).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

NEG_INF = -1.0e30


def _extended_states(token_seqs: Sequence[Sequence[int]], blank: int):
    """Concatenate utterances into one CTC extended state sequence.

    Returns (labels (S,), utt_of_state (S,)): blank-interleaved labels
    b c1 b c2 b ... b cK b, with utt_of_state = utterance index owning
    each NON-blank state (blanks belong to the preceding utterance,
    leading blank to utterance 0)."""
    labels = [blank]
    owner = [0]
    for u, seq in enumerate(token_seqs):
        for c in seq:
            labels.append(int(c))
            owner.append(u)
            labels.append(blank)
            owner.append(u)
    return np.asarray(labels, np.int64), np.asarray(owner, np.int64)


def ctc_segmentation_align(
    logp: np.ndarray,                 # (T, V) CTC log-posteriors
    token_seqs: Sequence[Sequence[int]],
    blank: int = 0,
    gratis_blank: bool = False,
    band: int = 0,                    # 0 = full DP (no band)
) -> Tuple[List[Tuple[int, int, float]], List[Tuple[int, int, int, float]]]:
    """Align utterance token sequences within one long posterior matrix.

    Returns:
      utt_segments: per utterance (start_frame, end_frame, confidence)
      token_timings: flat list of (utt_idx, token_id, frame, score)
    """
    logp = np.asarray(logp, np.float32)
    t_max, _v = logp.shape
    labels, owner = _extended_states(token_seqs, blank)
    s = len(labels)
    band = s if band <= 0 else min(band, s)

    emit = logp[:, labels]                      # (T, S) emission scores
    if gratis_blank:
        emit[:, labels == blank] = 0.0

    # skip-allowed mask: state s can come from s-2 when both non-blank
    # and different labels (standard CTC topology)
    can_skip = np.zeros(s, bool)
    can_skip[2:] = (labels[2:] != blank) & (labels[2:] != labels[:-2])

    # banded Viterbi: at time t the band covers states centered on the
    # diagonal s ≈ (t / T) * S
    alpha = np.full(s, NEG_INF, np.float32)
    alpha[0] = 0.0                               # free start in blank 0
    if s > 1:
        alpha[1] = emit[0, 1]
    bp_store = np.zeros((t_max, band), np.int8)  # 0 stay, 1 prev, 2 skip
    lo_store = np.zeros(t_max, np.int64)

    for t in range(1, t_max):
        center = int(t / max(t_max - 1, 1) * (s - 1))
        lo = max(0, min(center - band // 2, s - band))
        hi = lo + band
        lo_store[t] = lo

        a = alpha[lo:hi]
        prev = np.concatenate(([NEG_INF], alpha[lo: hi - 1]))
        skip = np.concatenate(([NEG_INF, NEG_INF], alpha[lo: hi - 2]))
        skip = np.where(can_skip[lo:hi], skip, NEG_INF)
        stacked = np.stack([a, prev, skip])       # (3, band)
        bp = stacked.argmax(axis=0).astype(np.int8)
        best = stacked[bp, np.arange(hi - lo)]
        new = np.full(s, NEG_INF, np.float32)
        new[lo:hi] = best + emit[t, lo:hi]
        # free re-entry into the leading blank: the audio may run long
        # before the text starts
        if lo == 0:
            new[0] = max(new[0], 0.0 if gratis_blank else emit[t, 0])
        bp_store[t, : hi - lo] = bp
        alpha = new

    # end in the final blank or final label
    end_state = s - 1 if alpha[s - 1] >= alpha[s - 2] else s - 2

    # backtrace
    state_of_t = np.zeros(t_max, np.int64)
    st = end_state
    for t in range(t_max - 1, 0, -1):
        state_of_t[t] = st
        lo = lo_store[t]
        idx = st - lo
        if 0 <= idx < band:
            move = bp_store[t, idx]
        else:  # outside the stored band (only possible at edges): stay
            move = 0
        st = st - int(move)
        st = max(st, 0)
    state_of_t[0] = st

    # per-token timing + score
    token_timings: List[Tuple[int, int, int, float]] = []
    tok_best: dict = {}
    tok_frames: dict = {}
    for t in range(t_max):
        s_t = state_of_t[t]
        if labels[s_t] != blank:
            key = s_t  # state index uniquely ids the token instance
            sc = float(logp[t, labels[s_t]])
            if key not in tok_best or sc > tok_best[key]:
                tok_best[key] = sc
            tok_frames.setdefault(key, []).append(t)

    utt_first: dict = {}
    utt_last: dict = {}
    utt_conf: dict = {}
    for key, frames in tok_frames.items():
        u = int(owner[key])
        token_timings.append(
            (u, int(labels[key]), frames[0], tok_best[key])
        )
        utt_first[u] = min(utt_first.get(u, t_max), frames[0])
        utt_last[u] = max(utt_last.get(u, -1), frames[-1])
        utt_conf[u] = min(utt_conf.get(u, 0.0), tok_best[key])

    utt_segments = []
    for u in range(len(token_seqs)):
        if u in utt_first:
            utt_segments.append(
                (utt_first[u], utt_last[u] + 1, float(utt_conf[u]))
            )
        else:  # utterance got no frames (degenerate) — zero-length, -inf
            utt_segments.append((0, 0, float(NEG_INF)))
    token_timings.sort(key=lambda x: x[2])
    return utt_segments, token_timings
