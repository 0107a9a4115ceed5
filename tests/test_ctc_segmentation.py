"""Long-audio CTC segmentation (search/ctc_segmentation.py; reference
espnet/bin/asr_align.py:228 via the ctc_segmentation package)."""
import numpy as np

from espnet_tpu.search.ctc_segmentation import ctc_segmentation_align


def _posteriors_from_script(script, v, t_total, sharp=8.0, seed=0):
    """Build (T, V) log-posteriors that 'say' the given frame script:
    list of (token_id, n_frames); blank=0 elsewhere."""
    rng = np.random.RandomState(seed)
    logits = rng.randn(t_total, v).astype(np.float32) * 0.1
    t = 0
    for tok, n in script:
        logits[t: t + n, tok] += sharp
        t += n
    assert t <= t_total
    logits[t:, 0] += sharp  # trailing blank
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x)
    return np.log(p / p.sum(-1, keepdims=True))


def test_recovers_segment_boundaries():
    """Three utterances separated by long blank gaps in a 400-frame
    'recording': recovered windows must cover the true spans."""
    v = 6
    utts = [[1, 2], [3], [4, 5, 2]]
    script = [(0, 40)]
    truth = []
    t = 40
    for seq in utts:
        start = t
        for tok in seq:
            script.append((tok, 10))
            t += 10
        truth.append((start, t))
        script.append((0, 50))  # inter-utterance gap
        t += 50
    logp = _posteriors_from_script(script, v, 400)

    segs, timings = ctc_segmentation_align(logp, utts, gratis_blank=True)
    for (s, e, conf), (ts, te) in zip(segs, truth):
        # aligned window must sit inside the true span (±2 frames slack)
        assert ts - 2 <= s <= te and ts <= e <= te + 2, (s, e, ts, te)
        assert conf > np.log(0.5)  # sharp posteriors -> confident
    # token timings are monotone and owned by the right utterance
    frames = [f for _, _, f, _ in timings]
    assert frames == sorted(frames)
    assert len(timings) == sum(len(u) for u in utts)


def test_banded_matches_full():
    v = 5
    utts = [[1, 2, 3], [2, 4]]
    script = [(0, 20), (1, 8), (2, 8), (3, 8), (0, 30), (2, 8), (4, 8), (0, 20)]
    logp = _posteriors_from_script(script, v, 110)
    full, _ = ctc_segmentation_align(logp, utts, gratis_blank=True, band=0)
    banded, _ = ctc_segmentation_align(logp, utts, gratis_blank=True, band=9)
    assert [(s, e) for s, e, _ in full] == [(s, e) for s, e, _ in banded]


def test_low_confidence_on_wrong_transcript():
    """A transcript that is NOT in the audio gets low confidence."""
    v = 6
    script = [(0, 20), (1, 10), (2, 10), (0, 40)]
    logp = _posteriors_from_script(script, v, 80)
    right, _ = ctc_segmentation_align(logp, [[1, 2]], gratis_blank=True)
    wrong, _ = ctc_segmentation_align(logp, [[4, 5]], gratis_blank=True)
    assert right[0][2] > np.log(0.5)
    assert wrong[0][2] < np.log(0.1)
