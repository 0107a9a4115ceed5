"""Optimizer construction (reference: espnet/optimizer/factory.py, espnet2
optim_classes abs_task.py:82) on optax.

build_optimizer returns an optax.GradientTransformation implementing the
reference's semantics: grad clipping by global norm, optional gradient
noise, grad accumulation (MultiSteps), and nan/inf step skipping
(apply_if_finite ≙ reference trainer.py:439-452 nan-skip).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import optax


def build_optimizer(
    name: str = "adam",
    lr: Union[float, Callable] = 1e-3,
    grad_clip: Optional[float] = 5.0,
    accum_grad: int = 1,
    weight_decay: float = 0.0,
    grad_noise: bool = False,
    skip_nan_grad: bool = True,
    seed: int = 0,
    **kwargs,
) -> optax.GradientTransformation:
    chain = []
    if grad_clip is not None and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if grad_noise:
        # reference add_gradient_noise (asr_utils.py:616): eta/(1+step)^0.55;
        # keyed from the run seed so restarts with a new seed see new noise
        chain.append(optax.add_noise(eta=0.01, gamma=0.55, key=seed))

    if name == "adam":
        opt = optax.adam(lr, **kwargs)
    elif name == "adamw":
        opt = optax.adamw(lr, weight_decay=weight_decay, **kwargs)
    elif name == "sgd":
        opt = optax.sgd(lr, **kwargs)
    elif name == "adadelta":
        opt = optax.inject_hyperparams(optax.adadelta)(learning_rate=lr, **kwargs)
    elif name == "noam":
        # caller passes lr=noam_schedule(...)
        opt = optax.adam(lr, b1=0.9, b2=0.98, eps=1e-9)
    else:
        raise ValueError(f"unknown optimizer {name}")
    chain.append(opt)
    tx = optax.chain(*chain)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    if skip_nan_grad:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10000)
    return tx
