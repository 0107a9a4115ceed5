"""Functional train state + train/eval steps.

Replaces the reference's CustomUpdater / espnet2 Trainer hot loop
(espnet2/train/trainer.py:325-467) with a single jitted step: forward,
grad, clip, (noise), accumulate, nan-skip, optimizer update — all fused
by XLA and shardable under a mesh.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    extra_vars: Any  # non-trainable collections (norm_stats, batch_stats)
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng, extra_vars=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            extra_vars=extra_vars or {},
            opt_state=tx.init(params),
            rng=rng,
        )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    rng_names: Tuple[str, ...] = ("dropout", "specaug", "sampling", "maskctc"),
) -> Callable:
    """Build the jittable train step: (state, batch) → (state, stats).

    batch is a dict of arrays fed as model kwargs.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = {
            name: jax.random.fold_in(step_rng, i)
            for i, name in enumerate(rng_names)
        }

        def loss_fn(params):
            loss, stats = model.apply(
                {"params": params, **state.extra_vars},
                **batch,
                deterministic=False,
                rngs=rngs,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stats = dict(stats)
        grad_norm = optax.global_norm(grads)
        stats["grad_norm"] = grad_norm
        # non-finite loss/grads → the apply_if_finite wrapper drops the
        # update; surface it so the Trainer can count skips and abort the
        # epoch when every step was invalid (reference trainer.py:309-314)
        stats["skipped"] = 1.0 - (
            jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        ).astype(jnp.float32)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, stats

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
    ):
        # some modules keep dropout live at eval (e.g. Tacotron2 prenet,
        # reference tacotron2/decoder.py:134) — callers pass a fresh key
        # per batch; default key only for legacy call sites
        if rng is None:
            rng = jax.random.PRNGKey(0)
        loss, stats = model.apply(
            {"params": state.params, **state.extra_vars},
            **batch,
            deterministic=True,
            rngs={"dropout": rng},
        )
        return dict(stats)

    return eval_step
