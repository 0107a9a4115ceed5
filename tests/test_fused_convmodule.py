"""Fused conv-module Pallas kernel vs the unfused oracle
(ops/fused_convmodule.py): forward allclose + gradient parity for every
input and weight, with padding masks."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.fused_convmodule import (
    fused_conv_module,
    reference_conv_module,
)


def _setup(b=2, t=16, d=8, k=5, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, t, d).astype(np.float32))
    lens = np.full(b, t)
    lens[-1] = t - 3
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )
    params = dict(
        w1=jnp.asarray(r.randn(d, 2 * d).astype(np.float32) * 0.3),
        b1=jnp.asarray(r.randn(2 * d).astype(np.float32) * 0.1),
        dw=jnp.asarray(r.randn(k, d).astype(np.float32) * 0.3),
        bdw=jnp.asarray(r.randn(d).astype(np.float32) * 0.1),
        gscale=jnp.asarray(1.0 + 0.1 * r.randn(d).astype(np.float32)),
        gbias=jnp.asarray(0.1 * r.randn(d).astype(np.float32)),
        w2=jnp.asarray(r.randn(d, d).astype(np.float32) * 0.3),
        b2=jnp.asarray(r.randn(d).astype(np.float32) * 0.1),
    )
    return x, mask, params


def _call(fn, x, mask, p, interpret=False):
    args = (x, mask, p["w1"], p["b1"], p["dw"], p["bdw"],
            p["gscale"], p["gbias"], p["w2"], p["b2"])
    return fn(*args)


def _fused_interp(*args):
    # run the pallas kernels in interpret mode on CPU
    return fused_conv_module(*args, eps=1e-6, interpret=True)


def test_forward_matches_oracle():
    x, mask, p = _setup()
    ref = _call(reference_conv_module, x, mask, p)
    out = _call(_fused_interp, x, mask, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_oracle():
    x, mask, p = _setup(seed=1)
    names = list(p.keys())

    def loss_ref(x, *ws):
        pp = dict(zip(names, ws))
        out = _call(reference_conv_module, x, mask, pp)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_fused(x, *ws):
        pp = dict(zip(names, ws))
        out = _call(_fused_interp, x, mask, pp)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    ws = [p[n] for n in names]
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(ws) + 1)))(x, *ws)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(ws) + 1)))(x, *ws)
    for name, a, b in zip(["x"] + names, g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_even_kernel_and_single_row():
    x, mask, p = _setup(b=1, t=12, d=8, k=4, seed=2)
    ref = _call(reference_conv_module, x, mask, p)
    out = _call(_fused_interp, x, mask, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
