"""Greedy CTC decoding (best path): argmax → collapse repeats → strip
blanks. Jittable batch version returns fixed-size id buffers + lengths;
host post-processing maps to token lists.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def ctc_greedy_decode(
    logp: jnp.ndarray, tlens: jnp.ndarray, blank: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V) log-probs → (ids (B, T) left-packed, lengths (B,))."""
    b, t, _ = logp.shape
    path = jnp.argmax(logp, axis=-1)  # (B, T)
    prev = jnp.concatenate([jnp.full((b, 1), -1, path.dtype), path[:, :-1]], axis=1)
    valid_t = jnp.arange(t)[None, :] < tlens[:, None]
    keep = (path != blank) & (path != prev) & valid_t
    # left-pack kept tokens via argsort on (not keep)
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(path, order, axis=1)
    lens = keep.sum(axis=1)
    return packed, lens


def ctc_greedy_decode_host(logp: np.ndarray, tlens: np.ndarray, blank: int = 0) -> List[List[int]]:
    out = []
    for b in range(logp.shape[0]):
        path = np.argmax(logp[b, : tlens[b]], axis=-1)
        seq, prev = [], -1
        for p in path:
            if p != blank and p != prev:
                seq.append(int(p))
            prev = p
        out.append(seq)
    return out
