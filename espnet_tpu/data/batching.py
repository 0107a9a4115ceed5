"""Length-adaptive batching with bucketed static shapes.

Re-design of the reference batchers (espnet/utils/training/batchfy.py:327
make_batchset; espnet2/samplers/*) for XLA: batches are built by sorted
length (seq / bin / frame-count modes, sortagrad) and then PADDED UP to
bucket boundaries so the number of distinct compiled shapes stays small —
the jit-cache-friendly replacement for fully dynamic batch shapes.
"""
from __future__ import annotations

import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


def bucket_length(n: int, min_bucket: int = 32, growth: float = 1.25) -> int:
    """Smallest bucket boundary >= n: min_bucket * growth^k (rounded to 8)."""
    if n <= min_bucket:
        return min_bucket
    k = math.ceil(math.log(n / min_bucket) / math.log(growth))
    b = min_bucket * growth**k
    return int(math.ceil(b / 8) * 8)


def filter_by_length(
    shapes: Dict[str, Sequence[int]],
    min_frames: int = 0,
    max_frames: Optional[int] = None,
    out_shapes: Optional[Dict[str, Sequence[int]]] = None,
    min_tokens: int = 0,
    max_tokens: Optional[int] = None,
) -> Tuple[Dict[str, Sequence[int]], int]:
    """Drop too-short/too-long utterances before batching.

    ≙ reference utils/remove_longshortdata.sh and the espnet2 filtering
    stage (egs2/TEMPLATE/asr1/asr.sh:490 --min_wav_duration/--max_wav_duration):
    degenerate lengths waste padded-bucket compute and can OOM a chip, so
    they are filtered host-side. `out_shapes` (target lengths, e.g. token
    counts) applies the min/max_tokens bounds. Returns (kept, n_dropped).
    """
    kept: Dict[str, Sequence[int]] = {}
    for k, shp in shapes.items():
        t = int(shp[0])
        if t < min_frames or (max_frames is not None and t > max_frames):
            continue
        if out_shapes is not None and k in out_shapes:
            l = int(out_shapes[k][0])
            if l < min_tokens or (max_tokens is not None and l > max_tokens):
                continue
        kept[k] = shp
    return kept, len(shapes) - len(kept)


def make_batches(
    shapes: Dict[str, Sequence[int]],
    batch_size: int = 32,
    batch_bins: Optional[int] = None,
    mode: str = "seq",  # seq | bin | frame | folded
    sortagrad: bool = False,
    shuffle_seed: Optional[int] = None,
    min_batch_size: int = 1,
    drop_last: bool = False,
    fold_length: int = 400,
    categories: Optional[Dict[str, str]] = None,
) -> List[List[str]]:
    """shapes: {uttid: (T, ...)} → list of batches (lists of uttids).

    mode seq: fixed #utts; bin: total T*D per batch <= batch_bins
    (≙ espnet2 NumElementsBatchSampler); frame: total T per batch <=
    batch_bins (≙ LengthBatchSampler); folded: per-batch size
    batch_size // ceil(L_max/fold_length) (≙ FoldedBatchSampler,
    folded_batch_sampler.py:13).

    categories: optional {uttid: label}; utterances only batch with
    their own label (reference batchfy.py:346 'category' grouping /
    espnet2 utt2category) — batches from all groups are then shuffled
    together.
    """
    if categories:
        groups: Dict[str, Dict[str, Sequence[int]]] = {}
        for k, shp in shapes.items():
            groups.setdefault(categories.get(k, ""), {})[k] = shp
        batches: List[List[str]] = []
        for label in sorted(groups):
            batches.extend(
                make_batches(
                    groups[label], batch_size=batch_size,
                    batch_bins=batch_bins, mode=mode, sortagrad=False,
                    shuffle_seed=None, min_batch_size=min_batch_size,
                    drop_last=drop_last, fold_length=fold_length,
                )
            )
        if shuffle_seed is not None:
            rng = np.random.RandomState(shuffle_seed)
            rng.shuffle(batches)
        return batches
    items = sorted(shapes.items(), key=lambda kv: -int(kv[1][0]))
    batches: List[List[str]] = []
    if mode == "seq":
        for i in range(0, len(items), batch_size):
            batches.append([k for k, _ in items[i: i + batch_size]])
    elif mode == "folded":
        i = 0
        while i < len(items):
            l_max = int(items[i][1][0])  # sorted desc → first is longest
            bs = max(batch_size // max(-(-l_max // fold_length), 1),
                     min_batch_size)
            batches.append([k for k, _ in items[i: i + bs]])
            i += bs
    else:
        cur: List[str] = []
        cur_cost = 0
        for k, shp in items:
            t = int(shp[0])
            cost = t * (int(shp[1]) if (mode == "bin" and len(shp) > 1) else 1)
            if cur and cur_cost + cost > (batch_bins or 1 << 60):
                batches.append(cur)
                cur, cur_cost = [], 0
            cur.append(k)
            cur_cost += cost
        if cur and (not drop_last or len(cur) >= min_batch_size):
            batches.append(cur)
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        if sortagrad:
            head, tail = batches[:1], batches[1:]
            rng.shuffle(tail)
            batches = head + tail
        else:
            rng.shuffle(batches)
    return batches


def pad_batch(
    arrays: List[np.ndarray],
    pad_value: float = 0.0,
    bucket: bool = True,
    min_bucket: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length arrays → (padded (B, Tb, ...), lengths (B,)).

    With bucket=True the time axis is padded up to a bucket boundary so jit
    recompiles stay bounded.
    """
    lens = np.array([a.shape[0] for a in arrays], dtype=np.int32)
    tmax = int(lens.max())
    if bucket:
        tmax = bucket_length(tmax, min_bucket)
    rest = arrays[0].shape[1:]
    out = np.full((len(arrays), tmax) + rest, pad_value, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out, lens
