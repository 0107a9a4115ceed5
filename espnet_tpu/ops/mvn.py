"""Mean-variance normalisation, global and per-utterance.

Capability parity with espnet2/layers/global_mvn.py and utterance_mvn.py.
Global stats come from a collect-stats pass ({count, sum, sum_square});
both transforms are jittable and mask-correct.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


def global_mvn(
    x: jnp.ndarray,
    ilens: Optional[jnp.ndarray],
    mean: jnp.ndarray,
    std: jnp.ndarray,
    norm_means: bool = True,
    norm_vars: bool = True,
) -> jnp.ndarray:
    """Normalise ``(B, T, D)`` features with precomputed global stats."""
    if norm_means:
        x = x - mean
    if norm_vars:
        x = x / jnp.maximum(std, 1e-20)
    if ilens is not None:
        x = x * make_non_pad_mask(ilens, x.shape[1])[..., None]
    return x


def stats_to_mean_std(
    count: float, sum_: jnp.ndarray, sum_square: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert accumulated {count, sum, sum_square} to (mean, std)."""
    mean = sum_ / count
    var = jnp.maximum(sum_square / count - mean**2, 1e-20)
    return mean, jnp.sqrt(var)


def utterance_mvn(
    x: jnp.ndarray,
    ilens: Optional[jnp.ndarray] = None,
    norm_means: bool = True,
    norm_vars: bool = False,
    eps: float = 1.0e-20,
) -> jnp.ndarray:
    """Per-utterance MVN over valid frames of ``(B, T, D)``."""
    if ilens is None:
        n = x.shape[1]
        mean = x.mean(axis=1, keepdims=True)
        sq = (x**2).mean(axis=1, keepdims=True)
    else:
        mask = make_non_pad_mask(ilens, x.shape[1])[..., None]  # (B, T, 1)
        n = jnp.maximum(ilens[:, None, None].astype(x.dtype), 1.0)
        xm = x * mask
        mean = xm.sum(axis=1, keepdims=True) / n
        sq = (xm**2).sum(axis=1, keepdims=True) / n
    if norm_means:
        x = x - mean
        if ilens is not None:
            x = x * make_non_pad_mask(ilens, x.shape[1])[..., None]
    if norm_vars:
        var = jnp.maximum(sq - mean**2, eps)
        x = x / jnp.sqrt(var)
    return x
