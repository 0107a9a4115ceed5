"""Transducer tests: RNN-T loss vs brute-force lattice DP, model
forward/backward, greedy + beam decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.losses.transducer import rnnt_loss
from espnet_tpu.models.asr import RNNEncoder
from espnet_tpu.models.transducer import TransducerModel


def np_rnnt_loss(log_probs, labels, t_len, u_len, blank=0):
    """Naive O(T*U) DP in plain numpy (per sample)."""
    lp = log_probs  # (T, U+1, V)
    u1 = u_len + 1
    alpha = np.full((t_len, u1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else -np.inf
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def test_rnnt_loss_vs_bruteforce():
    rng = np.random.RandomState(0)
    b, t, u, v = 3, 7, 4, 6
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    ilens = np.array([t, t - 2, t - 3])
    llens = np.array([u, u - 1, u - 2])
    got = np.asarray(
        rnnt_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(ilens), jnp.asarray(llens),
        )
    )
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lp = np.asarray(lp, dtype=np.float64)
    for i in range(b):
        expect = np_rnnt_loss(lp[i], labels[i], ilens[i], llens[i])
        np.testing.assert_allclose(got[i], expect, rtol=1e-4, atol=1e-4)


def test_rnnt_loss_grad_finite():
    rng = np.random.RandomState(1)
    b, t, u, v = 2, 5, 3, 5
    logits = jnp.asarray(rng.randn(b, t, u + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, u)).astype(np.int32))
    g = jax.grad(
        lambda lg: rnnt_loss(
            lg, labels, jnp.array([t, t - 1]), jnp.array([u, u - 1])
        ).sum()
    )(logits)
    assert np.isfinite(np.asarray(g)).all()


@pytest.fixture(scope="module")
def trained_transducer():
    """Tiny transducer overfitted on one synthetic batch."""
    import optax

    rng = np.random.RandomState(2)
    b, t, d, v, u = 4, 20, 8, 6, 3
    ys = rng.randint(1, v - 1, size=(b, u)).astype(np.int32)
    feats = np.zeros((b, t, d), dtype=np.float32)
    for i in range(b):
        for j, y in enumerate(ys[i]):
            feats[i, j * (t // u): (j + 1) * (t // u), y] = 2.0
    feats += rng.randn(b, t, d).astype(np.float32) * 0.05
    batch = dict(
        speech=jnp.asarray(feats),
        speech_lengths=jnp.full((b,), t, jnp.int32),
        text=jnp.asarray(ys),
        text_lengths=jnp.full((b,), u, jnp.int32),
    )
    enc = RNNEncoder(elayers=1, eunits=16, eprojs=16)
    model = TransducerModel(vocab_size=v, encoder=enc, dunits=16, joint_dim=16)
    variables = model.init(jax.random.PRNGKey(0), **{k: batch[k] for k in batch})
    tx = optax.adam(5e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            loss, _ = model.apply({"params": p}, **batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = variables["params"]
    losses = []
    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    return model, {"params": params}, batch, ys


def test_transducer_greedy(trained_transducer):
    from espnet_tpu.search.transducer import transducer_greedy_decode

    model, variables, batch, ys = trained_transducer
    hs, hlens = model.apply(
        variables, batch["speech"], batch["speech_lengths"], method="encode"
    )
    ids, lens = transducer_greedy_decode(model, variables, hs, hlens)
    correct = 0
    for i in range(ys.shape[0]):
        got = [int(x) for x in np.asarray(ids[i])[: int(lens[i])]]
        if got == list(ys[i]):
            correct += 1
    assert correct >= ys.shape[0] - 1, "greedy decode failed on overfit data"


def test_transducer_beam(trained_transducer):
    from espnet_tpu.search.transducer import (
        transducer_beam_decode,
        transducer_greedy_decode,
    )

    model, variables, batch, ys = trained_transducer
    hs, hlens = model.apply(
        variables, batch["speech"], batch["speech_lengths"], method="encode"
    )
    nbest = transducer_beam_decode(
        model, variables, hs[:1], int(hlens[0]), beam_size=4
    )
    assert len(nbest) >= 1
    ids, lens = transducer_greedy_decode(model, variables, hs[:1], hlens[:1])
    greedy = [int(x) for x in np.asarray(ids[0])[: int(lens[0])]]
    # beam-best should be at least as good as greedy on the training data
    assert nbest[0][0] == list(ys[0]) or nbest[0][0] == greedy


def test_transducer_tsd_alsd(trained_transducer):
    from espnet_tpu.search.transducer import (
        transducer_alsd_decode,
        transducer_tsd_decode,
    )

    model, variables, batch, ys = trained_transducer
    hs, hlens = model.apply(
        variables, batch["speech"], batch["speech_lengths"], method="encode"
    )
    tsd = transducer_tsd_decode(model, variables, hs[:1], int(hlens[0]), beam_size=3)
    alsd = transducer_alsd_decode(model, variables, hs[:1], int(hlens[0]), beam_size=3)
    assert tsd and alsd
    # on overfit data both should recover the training labels
    assert tsd[0][0] == list(ys[0])
    assert alsd[0][0] == list(ys[0])


@pytest.mark.slow
def test_chunked_lattice_matches_full():
    rng = np.random.RandomState(9)
    b, t, d, v, u = 2, 13, 8, 6, 3
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    ys = jnp.asarray(rng.randint(1, v - 1, (b, u)).astype(np.int32))
    batch = dict(
        speech=feats, speech_lengths=jnp.array([t, t - 4]),
        text=ys, text_lengths=jnp.array([u, u - 1]),
    )
    enc = RNNEncoder(elayers=1, eunits=8, eprojs=8)
    full = TransducerModel(vocab_size=v, encoder=enc, dunits=8, joint_dim=8)
    chunked = TransducerModel(
        vocab_size=v, encoder=enc, dunits=8, joint_dim=8, time_chunk=4
    )
    variables = full.init(jax.random.PRNGKey(0), **batch)
    loss_f, _ = full.apply(variables, **batch)
    loss_c, _ = chunked.apply(variables, **batch)
    np.testing.assert_allclose(float(loss_f), float(loss_c), rtol=1e-5)
    g_f = jax.grad(lambda p: full.apply({"params": p}, **batch)[0])(variables["params"])
    g_c = jax.grad(lambda p: chunked.apply({"params": p}, **batch)[0])(variables["params"])
    for a, b_ in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_transducer_nsc(trained_transducer):
    from espnet_tpu.search.transducer import transducer_nsc_decode

    model, variables, batch, ys = trained_transducer
    hs, hlens = model.apply(
        variables, batch["speech"], batch["speech_lengths"], method="encode"
    )
    nsc = transducer_nsc_decode(model, variables, hs[:1], int(hlens[0]), beam_size=3)
    assert nsc and nsc[0][0] == list(ys[0])
