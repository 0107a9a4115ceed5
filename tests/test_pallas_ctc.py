"""Pallas CTC kernel vs the lax.scan reference (interpret mode on CPU;
the same code compiles with Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.losses.ctc import ctc_loss
from espnet_tpu.losses.pallas_ctc import ctc_loss_pallas


def _case(seed=0, b=3, t=20, v=8, lmax=6):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ilens = jnp.asarray(np.array([t, t - 4, t - 7])[:b])
    llens = jnp.asarray(np.array([lmax, lmax - 2, lmax - 3])[:b])
    labels = rng.randint(1, v, size=(b, lmax)).astype(np.int32)
    return logp, jnp.asarray(labels), ilens, llens, logits


def test_pallas_ctc_forward_matches_scan():
    logp, labels, ilens, llens, _ = _case()
    ref = ctc_loss(logp, labels, ilens, llens)
    got = ctc_loss_pallas(logp, labels, ilens, llens, 0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_ctc_grad_matches_scan():
    logp, labels, ilens, llens, logits = _case(seed=3)

    def f_ref(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, labels, ilens, llens).sum()

    def f_pal(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss_pallas(lp, labels, ilens, llens, 0, True).sum()

    g_ref = jax.grad(f_ref)(jnp.asarray(logits))
    g_pal = jax.grad(f_pal)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )


def test_pallas_ctc_weighted_cotangent():
    logp, labels, ilens, llens, logits = _case(seed=5, b=2)
    w = jnp.array([0.3, 1.7])

    def f_ref(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return (ctc_loss(lp, labels[:2], ilens[:2], llens[:2]) * w).sum()

    def f_pal(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return (ctc_loss_pallas(lp, labels[:2], ilens[:2], llens[:2], 0, True) * w).sum()

    g_ref = jax.grad(f_ref)(jnp.asarray(logits))
    g_pal = jax.grad(f_pal)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )
