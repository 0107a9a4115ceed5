"""Conv2d time subsampling (reference: transformer/subsampling.py:14,73,121).

Two (or three) stride-2 conv layers over (T, F) with ReLU, then a linear
projection of the flattened channel×freq axis. Subsampling factors 4/6/8
mirror Conv2dSubsampling{,6,8}.

TPU note: convs map straight onto the MXU via XLA; the output length
formula floor((t-1)/2-1)/2... is kept identical to the reference so
downstream masks match.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def conv2d_output_length(t: int, factor: int) -> int:
    if factor == 4:
        return (((t - 1) // 2) - 1) // 2
    if factor == 6:
        return (((t - 1) // 2) - 2) // 3
    if factor == 8:
        return (((((t - 1) // 2) - 1) // 2) - 1) // 2
    raise ValueError(factor)


class Conv2dSubsampling(nn.Module):
    """(B, T, D) → (B, T', odim), T' ≈ T/factor; returns new lengths too."""

    odim: int
    factor: int = 4  # 4, 6, or 8
    dropout_rate: float = 0.0
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ilens: jnp.ndarray, deterministic: bool = True):
        x = x[..., None]  # (B, T, F, 1) NHWC
        if self.factor == 4:
            strides = [(2, 2), (2, 2)]
            kernels = [(3, 3), (3, 3)]
        elif self.factor == 6:
            strides = [(2, 2), (3, 3)]
            kernels = [(3, 3), (5, 5)]
        elif self.factor == 8:
            strides = [(2, 2), (2, 2), (2, 2)]
            kernels = [(3, 3), (3, 3), (3, 3)]
        else:
            raise ValueError(self.factor)
        for kern, stride in zip(kernels, strides):
            x = nn.Conv(self.odim, kern, strides=stride, padding="VALID", dtype=self.dtype)(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        x = nn.Dense(self.odim, dtype=self.dtype)(x.reshape(b, t, f * c))

        olens = ilens
        for kern, stride in zip(kernels, strides):
            olens = (olens - kern[0]) // stride[0] + 1
        return x, olens
