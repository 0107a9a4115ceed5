"""CTC loss golden tests vs torch.nn.functional.ctc_loss and optax."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from espnet_tpu.losses.ctc import ctc_forced_align, ctc_loss


def _rand_case(b=3, t=20, v=8, lmax=6, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    ilens = np.array([t, t - 4, t - 7])[:b]
    llens = np.array([lmax, lmax - 2, lmax - 3])[:b]
    labels = rng.randint(1, v, size=(b, lmax)).astype(np.int32)
    for i in range(b):
        labels[i, llens[i]:] = -1
    return logits, labels, ilens, llens


def test_ctc_loss_vs_torch():
    logits, labels, ilens, llens = _rand_case()
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ours = ctc_loss(logp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens))

    t_logp = F.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    flat = [labels[i, : llens[i]] for i in range(len(ilens))]
    targets = torch.from_numpy(np.concatenate(flat)).long()
    ref = F.ctc_loss(
        t_logp,
        targets,
        torch.tensor(ilens),
        torch.tensor(llens),
        blank=0,
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_grad_vs_torch():
    logits, labels, ilens, llens = _rand_case(seed=3)

    def loss_fn(lg):
        logp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            logp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
        ).sum()

    g = jax.grad(loss_fn)(jnp.asarray(logits))

    tl = torch.from_numpy(logits).requires_grad_(True)
    t_logp = F.log_softmax(tl, dim=-1).transpose(0, 1)
    flat = [labels[i, : llens[i]] for i in range(len(ilens))]
    targets = torch.from_numpy(np.concatenate(flat)).long()
    ref = F.ctc_loss(
        t_logp, targets, torch.tensor(ilens), torch.tensor(llens),
        blank=0, reduction="sum",
    )
    ref.backward()
    np.testing.assert_allclose(np.asarray(g), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_loss_jit():
    logits, labels, ilens, llens = _rand_case(seed=5)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    f = jax.jit(ctc_loss)
    out = f(logp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens))
    assert np.isfinite(np.asarray(out)).all()


def test_forced_align_valid_path():
    logits, labels, ilens, llens = _rand_case(seed=7)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    align = np.asarray(
        ctc_forced_align(
            logp, jnp.asarray(labels), jnp.asarray(ilens), jnp.asarray(llens)
        )
    )
    b, t, _ = logits.shape
    for i in range(b):
        seq = align[i, : ilens[i]]
        # collapse repeats + remove blanks must equal the target
        collapsed = [k for j, k in enumerate(seq) if k != 0 and (j == 0 or seq[j - 1] != k)]
        np.testing.assert_array_equal(np.array(collapsed), labels[i, : llens[i]])
