"""Fused Pallas attention vs the XLA decomposition.

Mirrors the reference's attention numerics tests
(test/test_e2e_asr_transformer.py tiny-model pattern): same module, same
weights, fused on/off must agree for vanilla and rel-pos MHSA with and
without key-padding masks, forward and gradient.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import espnet_tpu.ops.fused_attention as fa
from espnet_tpu.layers.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _data(b=2, t=8, d=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lens = np.array([t, t - 3][:b])
    mask = jnp.asarray(np.arange(t)[None] < lens[:, None])[:, None]  # (B,1,T)
    pos = jnp.asarray(rng.randn(1, 2 * t - 1, d).astype(np.float32))
    return x, mask, pos


@pytest.mark.parametrize("use_mask", [True, False])
def test_fused_mha_matches_xla(use_mask):
    x, mask, _ = _data()
    mask = mask if use_mask else None
    fused = MultiHeadedAttention(2, 16, use_fused=True)
    plain = MultiHeadedAttention(2, 16, use_fused=False)
    variables = fused.init(jax.random.PRNGKey(0), x, x, x, mask)

    def f_fused(v, x):
        return jnp.sum(fused.apply(v, x, x, x, mask) ** 2)

    def f_plain(v, x):
        return jnp.sum(plain.apply(v, x, x, x, mask) ** 2)

    out_f = fused.apply(variables, x, x, x, mask)
    out_p = plain.apply(variables, x, x, x, mask)
    if use_mask:
        # padded key columns are excluded either way; padded *query* rows
        # may differ (garbage in both paths) — compare valid region
        np.testing.assert_allclose(
            np.asarray(out_f[0]), np.asarray(out_p[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_f[1, :5]), np.asarray(out_p[1, :5]), atol=1e-5
        )
    else:
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)

    g_f = jax.grad(f_fused)(variables, x)
    g_p = jax.grad(f_plain)(variables, x)
    for pf, pp in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pp), atol=2e-4)


def test_fused_relpos_matches_xla():
    x, mask, pos = _data()
    fused = RelPositionMultiHeadedAttention(2, 16, use_fused=True)
    plain = RelPositionMultiHeadedAttention(2, 16, use_fused=False)
    variables = fused.init(jax.random.PRNGKey(0), x, x, x, pos, mask)
    out_f = fused.apply(variables, x, x, x, pos, mask)
    out_p = plain.apply(variables, x, x, x, pos, mask)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(out_p[0]), atol=1e-5)

    def loss(mod):
        def f(v, x):
            return jnp.sum(mod.apply(v, x, x, x, pos, mask)[:, :5] ** 2)

        return f

    g_f = jax.grad(loss(fused))(variables, x)
    g_p = jax.grad(loss(plain))(variables, x)
    for pf, pp in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pp), atol=2e-4)


def test_fused_falls_back_on_causal_mask():
    """A (B, Tq, Tk) causal mask is not key-type — fused path must decline
    and the XLA path must be used (identical outputs by construction)."""
    x, _, _ = _data()
    t = x.shape[1]
    causal = jnp.tril(jnp.ones((1, t, t), bool))
    mod = MultiHeadedAttention(2, 16, use_fused=True)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x, causal)
    out = mod.apply(variables, x, x, x, causal)
    ref = MultiHeadedAttention(2, 16, use_fused=False).apply(
        variables, x, x, x, causal
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
