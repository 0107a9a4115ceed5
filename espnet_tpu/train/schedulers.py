"""LR schedules (reference: espnet/scheduler/scheduler.py NoamScheduler:118,
espnet2/schedulers/{noam_lr.py:12, warmup_lr.py:11}) as optax schedule fns.
"""
from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(model_size: int, factor: float = 10.0, warmup: int = 25000):
    """lr(step) = factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return (
            factor
            * model_size**-0.5
            * jnp.minimum(s**-0.5, s * warmup**-1.5)
        )

    return schedule


def warmup_lr_schedule(lr: float = 1e-3, warmup: int = 25000):
    """espnet2 WarmupLR: lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5)."""

    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return lr * warmup**0.5 * jnp.minimum(s**-0.5, s * warmup**-1.5)

    return schedule


def cyclic_cosine_schedule(lr: float, total_steps: int, cycles: int = 1):
    """CyclicCosineScheduler (scheduler.py:147)."""
    import numpy as np

    def schedule(step):
        cycle_len = max(total_steps // max(cycles, 1), 1)
        pos = (step % cycle_len) / cycle_len
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * pos))

    return schedule
