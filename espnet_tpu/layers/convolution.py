"""Conformer convolution module (reference: conformer/convolution.py:13).

pointwise-conv(2d) → GLU → depthwise-conv(k=31) → BatchNorm → swish →
pointwise-conv, all expressed as NWC convs. BatchNorm is replaced by
GroupNorm(1) by default: batch statistics are a poor fit for SPMD
training (cross-host sync) and mask-correct batch stats over padded
frames are subtle; group norm is the standard TPU-friendly substitute
with equivalent accuracy on Conformer. use_batch_norm=True restores
exact reference behaviour for parity runs.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.layers.feed_forward import swish


class ConformerConvModule(nn.Module):
    kernel_size: int = 31
    use_batch_norm: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, D); pad_mask: (B, T) True at VALID positions."""
        d = x.shape[-1]
        if pad_mask is not None:
            x = x * pad_mask[..., None]
        h = nn.Conv(2 * d, (1,), dtype=self.dtype)(x)
        h = nn.glu(h, axis=-1)
        if pad_mask is not None:
            h = h * pad_mask[..., None]
        h = nn.Conv(
            d,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=d,
            dtype=self.dtype,
        )(h)
        if self.use_batch_norm:
            h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        else:
            h = nn.GroupNorm(num_groups=1, dtype=self.dtype)(h)
        h = swish(h)
        h = nn.Conv(d, (1,), dtype=self.dtype)(h)
        if pad_mask is not None:
            h = h * pad_mask[..., None]
        return h
