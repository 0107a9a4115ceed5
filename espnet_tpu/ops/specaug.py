"""SpecAugment as a jittable transform.

Capability parity with the reference's SpecAug
(espnet2/asr/specaug/specaug.py:19, espnet2/layers/mask_along_axis.py,
espnet/transform/spec_augment.py:147): frequency masking, time masking,
and time warping — all static-shape, functional, PRNG-key driven so the
whole augmentation runs on device inside the jitted train step.

Time warp: the reference uses sparse_image_warp / PIL resize. On TPU we
implement the same "pick a centre w in [W, T-W), shift it by ±w'" warp as a
piecewise-linear time resample with fixed output length (linear gather
interpolation), which is the standard jittable formulation.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def mask_along_axis(
    rng: jax.Array,
    x: jnp.ndarray,
    mask_width_range: tuple[int, int],
    num_mask: int,
    axis: int,
    mask_value="zero",  # "zero" | "mean" | float (reference
                        # replace_with_zero true/false, spec_augment.py)
) -> jnp.ndarray:
    """Randomly mask `num_mask` stripes along `axis` of ``(B, T, D)``."""
    b = x.shape[0]
    size = x.shape[axis]
    r_width, r_pos = jax.random.split(rng)
    widths = jax.random.randint(
        r_width, (b, num_mask), mask_width_range[0], mask_width_range[1]
    )  # (B, M)
    starts = jax.random.randint(
        r_pos, (b, num_mask), 0, jnp.maximum(size - widths, 1)
    )
    pos = jnp.arange(size)  # (size,)
    # (B, M, size): inside any stripe?
    inside = (pos[None, None, :] >= starts[..., None]) & (
        pos[None, None, :] < (starts + widths)[..., None]
    )
    mask = inside.any(axis=1)  # (B, size)
    shape = [b, 1, 1]
    shape[axis] = size
    mask = mask.reshape(shape)
    if mask_value == "mean":
        fill = x.mean(axis=(1, 2), keepdims=True)
    elif mask_value == "zero":
        fill = 0.0
    else:
        fill = mask_value
    return jnp.where(mask, fill, x)


def time_warp(rng: jax.Array, x: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Piecewise-linear time warp of ``(B, T, D)`` with max shift `window`."""
    b, t, _ = x.shape
    if t - 2 * window <= 0:
        return x
    r_c, r_w = jax.random.split(rng)
    center = jax.random.randint(r_c, (b,), window, t - window)
    shift = jax.random.randint(r_w, (b,), -window, window + 1)
    warped_c = center + shift  # target position of original `center`

    pos = jnp.arange(t, dtype=jnp.float32)[None, :]  # (1, T)
    c = warped_c[:, None].astype(jnp.float32)
    c0 = center[:, None].astype(jnp.float32)
    tmax = float(t - 1)
    # output position p maps to source position: two linear segments
    src = jnp.where(
        pos < c,
        pos * c0 / jnp.maximum(c, 1.0),
        c0 + (pos - c) * (tmax - c0) / jnp.maximum(tmax - c, 1.0),
    )
    src = jnp.clip(src, 0.0, tmax)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]
    x_lo = jnp.take_along_axis(x, lo[..., None], axis=1)
    x_hi = jnp.take_along_axis(x, hi[..., None], axis=1)
    return x_lo * (1.0 - frac) + x_hi * frac


def spec_augment(
    rng: jax.Array,
    x: jnp.ndarray,
    apply_time_warp: bool = True,
    time_warp_window: int = 5,
    apply_freq_mask: bool = True,
    freq_mask_width_range: tuple[int, int] = (0, 20),
    num_freq_mask: int = 2,
    apply_time_mask: bool = True,
    time_mask_width_range: tuple[int, int] = (0, 100),
    num_time_mask: int = 2,
    mask_value="zero",
) -> jnp.ndarray:
    """Full SpecAugment pipeline on ``(B, T, D)`` log-mel features."""
    r_warp, r_freq, r_time = jax.random.split(rng, 3)
    if apply_time_warp:
        x = time_warp(r_warp, x, time_warp_window)
    if apply_freq_mask:
        x = mask_along_axis(
            r_freq, x, freq_mask_width_range, num_freq_mask, axis=2,
            mask_value=mask_value,
        )
    if apply_time_mask:
        x = mask_along_axis(
            r_time, x, time_mask_width_range, num_time_mask, axis=1,
            mask_value=mask_value,
        )
    return x
