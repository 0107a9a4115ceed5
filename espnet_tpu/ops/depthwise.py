"""Depthwise 1-D convolution with a forward-conv backward.

Why this exists: XLA's gradient of `lax.conv_general_dilated` with
`feature_group_count=D` lowers through a transposed-conv path that the
current TPU backend compiles to a per-tap loop — measured 42 ms for the
conformer conv module's backward at (B=128, T=512, D=256, K=31) where
the forward conv costs ~3 ms (tools/profile_encoder_sweep.py; the cost
scales with K). Both gradients of a depthwise conv are themselves
depthwise convolutions, and FORWARD depthwise convs compile fine — so
this op supplies a custom VJP that computes

  dx = depthwise_conv(dy, flip_k(w))   (padding complemented)
  dw[k, c] = Σ_{b,t} dy[b,t,c] · x[b, t+k-pad_l, c]   (K slice-reduces)

keeping every backward FLOP on the fast lowering. Numerically identical
to the default VJP (tests/test_depthwise.py asserts grad parity).

Layout: x (B, T, D), w (K, D); `pad_left` selects the alignment —
K//2 = centered 'same' (default, conformer conv module,
conformer/convolution.py:13), K-1 = causal (lightconv variants). Bias
is left to the caller.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x: jnp.ndarray, w: jnp.ndarray, pad_l: int, pad_r: int) -> jnp.ndarray:
    d = x.shape[-1]
    return lax.conv_general_dilated(
        x,
        w[:, None, :],  # (K, 1, D) WIO
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv1d(
    x: jnp.ndarray, w: jnp.ndarray, pad_left: int | None = None
) -> jnp.ndarray:
    """x: (B, T, D) · w: (K, D) → (B, T, D).

    pad_left=None → centered 'same' (K//2); K-1 → causal."""
    k = w.shape[0]
    pad_l = k // 2 if pad_left is None else pad_left
    return _conv(x, w, pad_l, k - 1 - pad_l)


def _fwd(x, w, pad_left):
    return depthwise_conv1d(x, w, pad_left), (x, w)


def _bwd(pad_left, res, dy):
    x, w = res
    k = w.shape[0]
    pad_l = k // 2 if pad_left is None else pad_left
    pad_r = k - 1 - pad_l
    # dx: depthwise conv of dy with the tap-reversed kernel, padding
    # complemented — a plain forward conv (fast lowering)
    dx = _conv(dy, w[::-1], pad_r, pad_l).astype(x.dtype)
    # dw[k] = Σ_{b,t} dy[b,t] ⊙ x[b, t+k-pad_l]: K unrolled
    # slice-multiply-reduces over a zero-padded x (elementwise + reduce
    # only — no conv involved)
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    f32 = jnp.float32
    dw = jnp.stack(
        [
            jnp.sum(
                dy.astype(f32) * lax.slice_in_dim(xp, i, i + t, axis=1).astype(f32),
                axis=(0, 1),
            )
            for i in range(k)
        ]
    ).astype(w.dtype)
    return dx, dw


depthwise_conv1d.defvjp(_fwd, _bwd)
