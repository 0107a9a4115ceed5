"""Conformer convolution module (reference: conformer/convolution.py:13).

pointwise-conv(2d) → GLU → depthwise-conv(k=31) → BatchNorm → swish →
pointwise-conv, all over (B, T, D). BatchNorm is replaced by
GroupNorm(1) by default: batch statistics are a poor fit for SPMD
training (cross-host sync) and mask-correct batch stats over padded
frames are subtle; group norm is the standard TPU-friendly substitute
with equivalent accuracy on Conformer. use_batch_norm=True restores
exact reference behaviour for parity runs.

Two compute paths over the SAME parameters:
- fused Pallas kernel (ops/fused_convmodule.py) — the whole module per
  batch row in VMEM, one HBM read + one write; OPT-IN via use_fused=True
  (see _fused_ok for why it is not auto-enabled in this environment).
  The XLA path makes ~10 HBM passes for ~15 µs of FLOPs (BENCHMARKS.md).
- unfused XLA formulation (identical math; CPU, BatchNorm, odd shapes,
  and the sequence-parallel encoder, where an opaque Pallas call would
  block GSPMD's T-sharding).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConformerConvModule(nn.Module):
    kernel_size: int = 31
    use_batch_norm: bool = False
    # True = fused Pallas kernel (opt-in; see _fused_ok); None/False =
    # unfused XLA path
    use_fused: Optional[bool] = None
    dtype: type = jnp.float32

    def _fused_ok(self, t: int, d: int) -> bool:
        # OPT-IN (use_fused=True), not auto: the kernel is numerically
        # verified (tests/test_fused_convmodule.py, interpret mode) but
        # its Mosaic compile through this environment's remote-compile
        # tunnel stalled indefinitely at encoder scale, wedging the only
        # TPU chip — too risky to enable by default until compiled
        # against a local toolchain. Requirements when enabled:
        # GroupNorm path, D % 128 == 0, T % 8 == 0, per-row VMEM fit.
        if self.use_fused is None:
            return False
        if not self.use_fused:
            return False
        return (
            jax.default_backend() == "tpu"
            and not self.use_batch_norm
            and d % 128 == 0
            and t % 8 == 0
            # per-row VMEM: x/out (t·d) + h2 (t·2d) + weights (~3d²)
            and (4 * t * d * 4 + 3 * d * d * 4) < 8 * 1024 * 1024
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, D); pad_mask: (B, T) True at VALID positions."""
        b, t, d = x.shape
        k = self.kernel_size
        # parameter shapes/init match nn.Conv's ((k, in, out) kernels,
        # lecun_normal fan-in over receptive-field × in-channels)
        w1 = self.param("pw1_kernel", nn.initializers.lecun_normal(), (1, d, 2 * d))
        b1 = self.param("pw1_bias", nn.initializers.zeros, (2 * d,))
        dwk = self.param("dw_kernel", nn.initializers.lecun_normal(), (k, 1, d))
        dwb = self.param("dw_bias", nn.initializers.zeros, (d,))
        w2 = self.param("pw2_kernel", nn.initializers.lecun_normal(), (1, d, d))
        b2 = self.param("pw2_bias", nn.initializers.zeros, (d,))

        cdtype = self.dtype
        xc = x.astype(cdtype)
        mask = (
            pad_mask.astype(jnp.float32)
            if pad_mask is not None
            else jnp.ones((b, t), jnp.float32)
        )

        if not self.use_batch_norm and self._fused_ok(t, d):
            gscale = self.param("norm_scale", nn.initializers.ones, (d,))
            gbias = self.param("norm_bias", nn.initializers.zeros, (d,))
            from espnet_tpu.ops.fused_convmodule import fused_conv_module

            return fused_conv_module(
                xc, mask,
                w1[0].astype(cdtype), b1,
                dwk[:, 0, :].astype(cdtype), dwb,
                gscale, gbias,
                w2[0].astype(cdtype), b2,
            )

        # unfused path: pointwise einsums + lax depthwise conv (the
        # measured XLA baseline lowering), GLU in f32
        maskc = mask[:, :, None].astype(cdtype)
        xm = xc * maskc
        h2 = (
            jnp.einsum("btd,de->bte", xm, w1[0].astype(cdtype)).astype(
                jnp.float32
            )
            + b1
        )
        h = h2[..., :d] * jax.nn.sigmoid(h2[..., d:])
        h = (h * mask[:, :, None]).astype(cdtype)
        # custom-VJP depthwise conv: the default conv gradient lowers to
        # a per-tap loop on the current TPU backend (42 ms at encoder
        # scale vs ~3 ms forward) — see ops/depthwise.py
        from espnet_tpu.ops.depthwise import depthwise_conv1d

        c = depthwise_conv1d(
            h, dwk[:, 0, :].astype(cdtype)
        ).astype(jnp.float32) + dwb
        if self.use_batch_norm:
            c = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype
            )(c.astype(cdtype)).astype(jnp.float32)
        else:
            gscale = self.param("norm_scale", nn.initializers.ones, (d,))
            gbias = self.param("norm_bias", nn.initializers.zeros, (d,))
            mu = jnp.mean(c, axis=(1, 2), keepdims=True)
            var = (
                jnp.mean(jnp.square(c), axis=(1, 2), keepdims=True)
                - jnp.square(mu)
            )
            c = gscale * ((c - mu) * jax.lax.rsqrt(var + 1e-6)) + gbias
        s = c * jax.nn.sigmoid(c)
        out = (
            jnp.einsum("btd,de->bte", s.astype(cdtype), w2[0].astype(cdtype))
            .astype(jnp.float32)
            + b2
        )
        return (out * mask[:, :, None]).astype(cdtype)
