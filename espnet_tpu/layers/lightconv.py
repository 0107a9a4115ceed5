"""Lightweight and dynamic convolution attention substitutes
(reference: transformer/lightconv.py:12, dynamic_conv.py:12,
lightconv2d.py:12, dynamic_conv2d.py:12 — the Wu et al. "Pay Less
Attention" variants selectable as encoder/decoder self-attention
replacements via ``--transformer-encoder-selfattn-layer-type``).

All four variants share the attention call signature
``(query, key, value, mask, deterministic)`` (key/value unused) so the
transformer encoder/decoder can swap them in for MultiHeadedAttention.

- LightweightConvolution: GLU in-proj → depthwise conv with
  softmax-normalised weights shared across ``wshare`` head groups →
  out-proj.
- DynamicConvolution: per-position conv weights predicted from the
  input.  Implemented as K shift-and-add passes over (B, T, D) instead
  of materialising (B, T, K, D) windows — K is small (11–31) and each
  pass is a fused multiply-add, so this stays HBM-friendly at encoder
  scale.
- The 2D variants add a frequency-axis depthwise conv branch whose
  output is concatenated with the time branch before the out-proj
  (reference lightconv2d.py:99-123, dynamic_conv2d.py:98-137).
- ``causal=True`` reproduces the reference ``use_kernel_mask``: future
  taps get -inf before the softmax (decoder self-attention use).
Out-of-range taps at sequence edges are likewise masked to -inf for the
dynamic variants so edge positions renormalise over real taps only
(parity with the reference's -inf-filled strided band matrix).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tap_validity(kernel_size: int, causal: bool) -> jnp.ndarray:
    """(K,) bool — True for taps a causal kernel may use (past+current)."""
    pad = kernel_size // 2
    taps = jnp.arange(kernel_size)
    if causal:
        return taps <= pad
    return jnp.ones((kernel_size,), bool)


def _freq_conv_shared(x: jnp.ndarray, wf: jnp.ndarray) -> jnp.ndarray:
    """Depthwise conv along the FEATURE axis with one shared kernel.

    x: (B, T, C); wf: (K,) normalised weights → (B, T, C).
    """
    b, t, c = x.shape
    k = wf.shape[0]
    pad = k // 2
    x2 = x.reshape(b * t, c, 1)
    kernel = wf.reshape(k, 1, 1).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x2,
        kernel,
        window_strides=(1,),
        padding=[(pad, k - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out.reshape(b, t, c)


def _freq_conv_dynamic(x: jnp.ndarray, wf: jnp.ndarray) -> jnp.ndarray:
    """Per-position kernels along the FEATURE axis via shift-and-add.

    x: (B, T, C); wf: (B, T, K) → (B, T, C).
    """
    b, t, c = x.shape
    k = wf.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, k - 1 - pad)))
    out = jnp.zeros_like(x)
    for j in range(k):
        out = out + wf[..., j : j + 1].astype(x.dtype) * xp[:, :, j : j + c]
    return out


class _ConvAttentionBase(nn.Module):
    """Shared implementation; subclass attributes pick the variant."""

    wshare: int = 4
    kernel_size: int = 15
    dropout_rate: float = 0.1
    use_bias: bool = False
    causal: bool = False       # reference use_kernel_mask
    dynamic: bool = False      # predicted vs shared kernels
    two_dim: bool = False      # add frequency-axis conv branch
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray = None,
        value: jnp.ndarray = None,
        mask: jnp.ndarray = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """(B, T, D) → (B, T, D); key/value accepted for API parity only."""
        del key, value
        x = query
        b, t, d = x.shape
        k = self.kernel_size
        pad = k // 2
        per = d // self.wshare
        wdrop = nn.Dropout(self.dropout_rate)

        h = nn.Dense(2 * d, dtype=self.dtype)(x)
        h = nn.glu(h, axis=-1)  # (B, T, D)

        valid = _tap_validity(k, self.causal)  # (K,)
        neg = jnp.finfo(jnp.float32).min

        # ---- time-axis conv branch
        if not self.dynamic:
            weight = self.param(
                "conv_weight",
                nn.initializers.uniform(1.0),
                (self.wshare, k),
            )
            # reference lightconv.py:95-100: dropout on raw weights, then
            # kernel mask, then softmax
            w = wdrop(weight, deterministic=deterministic)
            w = jnp.where(valid[None, :], w, neg)
            w = jax.nn.softmax(w, axis=-1)  # (H, K)
            w_full = jnp.repeat(w, per, axis=0)  # (D, K)
            # custom-VJP depthwise conv (ops/depthwise.py): the default
            # conv gradient lowers to a per-tap loop on TPU
            from espnet_tpu.ops.depthwise import depthwise_conv1d

            ht = depthwise_conv1d(
                h, w_full.T.astype(h.dtype), pad_left=pad
            )
        else:
            wk = nn.Dense(self.wshare * k, dtype=self.dtype)(x)
            wk = wdrop(wk, deterministic=deterministic)
            wk = wk.reshape(b, t, self.wshare, k).astype(jnp.float32)
            # mask causal + out-of-range taps before softmax so edge
            # positions renormalise over real taps (reference -inf band)
            pos = jnp.arange(t)[:, None] + jnp.arange(k)[None, :] - pad
            in_range = (pos >= 0) & (pos < t)  # (T, K)
            tap_ok = in_range & valid[None, :]
            wk = jnp.where(tap_ok[None, :, None, :], wk, neg)
            wk = jax.nn.softmax(wk, axis=-1)  # (B, T, H, K)
            hp = jnp.pad(h, ((0, 0), (pad, k - 1 - pad), (0, 0)))
            ht = jnp.zeros_like(h)
            for j in range(k):
                wj = jnp.repeat(wk[:, :, :, j], per, axis=-1)  # (B, T, D)
                ht = ht + wj.astype(h.dtype) * hp[:, j : j + t, :]

        if self.use_bias:
            ht = ht + self.param("conv_bias", nn.initializers.zeros, (d,))

        # ---- frequency-axis conv branch (2D variants)
        if self.two_dim:
            if not self.dynamic:
                weight_f = self.param(
                    "conv_weight_f", nn.initializers.uniform(1.0), (k,)
                )
                # same order as the time branch: dropout on raw weights,
                # then softmax — keeps the kernel a convex combination
                # at train time (no 1/(1-p) inflation)
                wf = wdrop(weight_f, deterministic=deterministic)
                wf = jax.nn.softmax(wf, axis=-1)
                hf = _freq_conv_shared(h, wf)
            else:
                # reference dynamic_conv2d.py:98-103 applies the
                # predicted frequency kernels WITHOUT softmax or
                # dropout (unlike its time branch) — kept as-is
                wf = nn.Dense(k, dtype=self.dtype)(x)  # (B, T, K)
                hf = _freq_conv_dynamic(h, wf)
            ht = jnp.concatenate([ht, hf], axis=-1)  # (B, T, 2D)

        # zero padded positions (reference masked_fill when not kernel-masked)
        if mask is not None and not self.causal:
            # mask: (B, 1, T) or (B, T, T) non-pad mask over key positions
            keep = mask[:, -1, :] if mask.ndim == 3 else mask
            ht = ht * keep[:, :, None].astype(ht.dtype)

        return nn.Dense(d, dtype=self.dtype)(ht)


class LightweightConvolution(_ConvAttentionBase):
    dynamic: bool = False
    two_dim: bool = False


class DynamicConvolution(_ConvAttentionBase):
    dynamic: bool = True
    two_dim: bool = False


class LightweightConvolution2D(_ConvAttentionBase):
    dynamic: bool = False
    two_dim: bool = True


class DynamicConvolution2D(_ConvAttentionBase):
    dynamic: bool = True
    two_dim: bool = True


def conv_attention_for(
    layer_type: str,
    *,
    wshare: int,
    kernel_size: int,
    dropout_rate: float,
    use_bias: bool = False,
    causal: bool = False,
    dtype=jnp.float32,
):
    """Factory keyed like the reference's selfattn-layer-type strings."""
    cls = {
        "lightconv": LightweightConvolution,
        "lightconv2d": LightweightConvolution2D,
        "dynamicconv": DynamicConvolution,
        "dynamicconv2d": DynamicConvolution2D,
    }[layer_type]
    return cls(
        wshare=wshare,
        kernel_size=kernel_size,
        dropout_rate=dropout_rate,
        use_bias=use_bias,
        causal=causal,
        dtype=dtype,
    )


def parse_kernel_length(spec, lnum: int, default: int = 15) -> int:
    """Per-layer kernel size from an int or a "11_13_15" string
    (reference lightconv.py kernel_size_str[lnum])."""
    if spec is None:
        return default
    if isinstance(spec, int):
        return spec
    parts = str(spec).split("_")
    return int(parts[lnum]) if lnum < len(parts) else int(parts[-1])
