"""Pallas RNN-T kernel vs the lax.scan reference (losses/transducer.py)
— loss and gradient parity, variable lengths (reference analog: the
warp-transducer golden tests; pattern mirrors tests/test_pallas_ctc.py).

Runs in interpret mode on CPU; the same kernels run compiled on TPU
(tools/bench_rnnt.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.losses.pallas_rnnt import (
    rnnt_loss_logits_pallas,
    rnnt_loss_pallas,
)
from espnet_tpu.losses.transducer import rnnt_loss, rnnt_loss_from_log_probs


def make_case(b=4, t=11, u=6, v=9, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    ilens = np.array([t, t - 3, t - 1, 5][:b], dtype=np.int32)
    llens = np.array([u, u - 2, 1, 3][:b], dtype=np.int32)
    return logits, labels, ilens, llens


def gathered(logits, labels, blank=0):
    lse = jax.nn.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank] - lse
    lab = jnp.broadcast_to(
        labels[:, None, :], (logits.shape[0], logits.shape[1], labels.shape[1])
    )
    lp_emit = (
        jnp.take_along_axis(logits[:, :, :-1, :], lab[..., None], axis=3)[..., 0]
        - lse[:, :, :-1]
    )
    return lp_blank, lp_emit


def test_loss_matches_scan():
    logits, labels, ilens, llens = make_case()
    want = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), ilens, llens)
    lp_blank, lp_emit = gathered(jnp.asarray(logits), jnp.asarray(labels))
    got = rnnt_loss_pallas(lp_blank, lp_emit, ilens, llens, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)


def test_grad_matches_scan():
    logits, labels, ilens, llens = make_case(b=4, t=9, u=5, v=7, seed=1)
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)

    def f_scan(lg):
        return rnnt_loss(lg, labels, ilens, llens).sum()

    def f_pallas(lg):
        return rnnt_loss_logits_pallas(
            lg, labels, ilens, llens, interpret=True
        ).sum()

    g_scan = jax.grad(f_scan)(logits)
    g_pallas = jax.grad(f_pallas)(logits)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_scan), atol=2e-4, rtol=2e-3
    )


def test_posteriors_sum_to_one():
    """Every path takes exactly ONE blank transition per frame (blank is
    what advances t), so Σ_u blank-posterior(t,·) == 1 at every valid t;
    and the total emit posterior mass equals llen per utterance."""
    logits, labels, ilens, llens = make_case(b=2, t=8, u=4, v=6, seed=2)
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    lp_blank, lp_emit = gathered(logits, labels)

    def f(lpb, lpe):
        return rnnt_loss_pallas(lpb, lpe, ilens, llens, True).sum()

    gb, ge = jax.grad(f, argnums=(0, 1))(lp_blank, lp_emit)
    blank_mass = -np.asarray(gb).sum(axis=2)  # (B, T)
    emit_mass = -np.asarray(ge).sum(axis=(1, 2))  # (B,)
    for i in range(2):
        np.testing.assert_allclose(blank_mass[i, : ilens[i]], 1.0, rtol=1e-3)
        np.testing.assert_allclose(blank_mass[i, ilens[i]:], 0.0, atol=1e-6)
        np.testing.assert_allclose(emit_mass[i], llens[i], rtol=1e-3)


def test_degenerate_lengths():
    # llen == 0 (blank-only path) must not nan
    logits, labels, ilens, llens = make_case(b=4, t=7, u=3, v=5, seed=3)
    llens = np.array([0, 1, 3, 0], dtype=np.int32)
    want = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), ilens, llens)
    lp_blank, lp_emit = gathered(jnp.asarray(logits), jnp.asarray(labels))
    got = rnnt_loss_pallas(lp_blank, lp_emit, ilens, llens, True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)


def test_transducer_model_pallas_impl_matches_scan():
    """TransducerModel(loss_impl=pallas) ≡ scan path (CPU interpret is
    driven through the pallas_call interpret flag via monkeypatching the
    default — here we call the loss fns directly through the model's
    gathered lattice path on tiny shapes where compiled CPU pallas
    isn't available, so compare the two loss functions the model
    dispatches to)."""
    from espnet_tpu.losses.pallas_rnnt import rnnt_loss_pallas
    from espnet_tpu.losses.transducer import rnnt_loss_from_log_probs

    logits, labels, ilens, llens = make_case(b=2, t=7, u=4, v=6, seed=5)
    lp_blank, lp_emit = gathered(jnp.asarray(logits), jnp.asarray(labels))
    want = rnnt_loss_from_log_probs(lp_blank, lp_emit, ilens[:2], llens[:2])
    got = rnnt_loss_pallas(lp_blank, lp_emit, ilens[:2], llens[:2], True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)

    # and the model dispatches on loss_impl without error (forward shape)
    from espnet_tpu.models.asr import RNNEncoder
    from espnet_tpu.models.transducer.model import TransducerModel

    enc = RNNEncoder(elayers=1, eunits=8, eprojs=8)
    for impl in ("scan",):  # compiled pallas needs TPU; scan runs anywhere
        model = TransducerModel(
            vocab_size=6, encoder=enc, dunits=8, joint_dim=8, loss_impl=impl
        )
        feats = np.random.RandomState(0).randn(2, 12, 5).astype(np.float32)
        v = model.init(
            jax.random.PRNGKey(0), feats, np.array([12, 9], np.int32),
            jnp.asarray(labels[:2, :4]), np.array([4, 3], np.int32),
        )
        loss, stats = model.apply(
            v, feats, np.array([12, 9], np.int32),
            jnp.asarray(labels[:2, :4]), np.array([4, 3], np.int32),
        )
        assert np.isfinite(float(loss))
