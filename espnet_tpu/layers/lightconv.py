"""Lightweight and dynamic convolution attention substitutes
(reference: transformer/lightconv.py:12, dynamic_conv.py:12 — the
Wu et al. "Pay Less Attention" variants selectable as
encoder/decoder self-attention replacements).

LightweightConvolution: depthwise conv with softmax-normalised shared
weights per head. DynamicConvolution: per-position conv weights predicted
from the input. Both are causal-maskable and jit-friendly.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LightweightConvolution(nn.Module):
    wshare: int = 4          # weight-sharing heads
    kernel_size: int = 15
    dropout_rate: float = 0.1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, D) → (B, T, D) with GLU in-proj and depthwise conv."""
        b, t, d = x.shape
        h = nn.Dense(2 * d)(x)
        h = nn.glu(h, axis=-1)  # (B, T, D)
        weight = self.param(
            "conv_weight",
            nn.initializers.normal(0.1),
            (self.wshare, self.kernel_size),
        )
        w = jax.nn.softmax(weight, axis=-1)  # normalised kernel per head
        # expand shared weights to all channels: D = wshare * (D // wshare)
        per = d // self.wshare
        w_full = jnp.repeat(w, per, axis=0)  # (D, K)
        # depthwise conv via feature_group_count: build kernel (K, 1, D)
        kernel = w_full.T[:, None, :]
        h = jax.lax.conv_general_dilated(
            h,
            kernel.astype(h.dtype),
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d,
        )
        if self.use_bias:
            h = h + self.param("conv_bias", nn.initializers.zeros, (d,))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d)(h)


class DynamicConvolution(nn.Module):
    wshare: int = 4
    kernel_size: int = 15
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Per-position predicted depthwise kernels."""
        b, t, d = x.shape
        h = nn.Dense(2 * d)(x)
        h = nn.glu(h, axis=-1)
        # predict (B, T, wshare, K) kernels from x
        wk = nn.Dense(self.wshare * self.kernel_size)(x)
        wk = wk.reshape(b, t, self.wshare, self.kernel_size)
        wk = jax.nn.softmax(wk, axis=-1)
        per = d // self.wshare
        # gather K shifted copies of h and contract with kernels
        k = self.kernel_size
        pad = k // 2
        hp = jnp.pad(h, ((0, 0), (pad, k - 1 - pad), (0, 0)))
        # windows: (B, T, K, D)
        idx = jnp.arange(t)[:, None] + jnp.arange(k)[None, :]
        windows = hp[:, idx]  # (B, T, K, D)
        windows = windows.reshape(b, t, k, self.wshare, per)
        out = jnp.einsum("btkwp,btwk->btwp", windows, wk).reshape(b, t, d)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return nn.Dense(d)(out)
