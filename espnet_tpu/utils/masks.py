"""Padding / attention mask utilities.

Equivalent capability to the reference's ``make_pad_mask`` /
``subsequent_mask`` helpers (espnet/nets/pytorch_backend/nets_utils.py:64,
espnet/nets/pytorch_backend/transformer/mask.py:20), re-designed for XLA:
every function is shape-static and jit-friendly (lengths may be traced).
"""
from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """Boolean mask, True at PADDED positions.

    Args:
        lengths: int array ``(B,)`` of valid lengths.
        maxlen: static padded length T.

    Returns:
        bool array ``(B, T)``; ``mask[b, t] == t >= lengths[b]``.
    """
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """Boolean mask, True at VALID positions. Complement of make_pad_mask."""
    return ~make_pad_mask(lengths, maxlen)


def subsequent_mask(size: int) -> jnp.ndarray:
    """Lower-triangular causal mask ``(size, size)``, True where attention
    is allowed (j <= i)."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def causal_attn_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """Combined causal + padding mask ``(B, T, T)`` for decoder self-attn."""
    causal = subsequent_mask(maxlen)[None]  # (1, T, T)
    valid = make_non_pad_mask(lengths, maxlen)[:, None, :]  # (B, 1, T)
    return causal & valid
