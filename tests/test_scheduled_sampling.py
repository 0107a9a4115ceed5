"""Scheduled sampling in the RNN decoder (reference
espnet/nets/pytorch_backend/rnn/decoders.py:142-170
sampling_probability)."""
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr.rnn_decoder import RNNDecoder


def _setup(p):
    dec = RNNDecoder(
        vocab_size=11, dunits=16, dlayers=1, att_dim=16,
        aconv_chans=2, aconv_filts=3, sampling_probability=p,
    )
    rng = np.random.RandomState(0)
    enc_h = jnp.asarray(rng.randn(2, 7, 16).astype(np.float32))
    hlens = jnp.asarray([7, 5], dtype=jnp.int32)
    ys_in = jnp.asarray(rng.randint(1, 10, size=(2, 5)), dtype=jnp.int32)
    return dec, enc_h, hlens, ys_in


def test_sampling_changes_training_forward_only():
    dec0, enc_h, hlens, ys_in = _setup(0.0)
    dec1, *_ = _setup(1.0)
    variables = dec0.init(jax.random.PRNGKey(0), enc_h, hlens, ys_in)
    rngs = {"dropout": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)}

    out0 = dec0.apply(variables, enc_h, hlens, ys_in, deterministic=False, rngs=rngs)
    out1 = dec1.apply(variables, enc_h, hlens, ys_in, deterministic=False, rngs=rngs)
    # p=1 feeds own argmax from step 1 on -> different logits after step 0
    assert np.allclose(out0[:, 0], out1[:, 0], atol=1e-5)
    assert not np.allclose(out0[:, 1:], out1[:, 1:])

    # inference path ignores sampling entirely
    det0 = dec0.apply(variables, enc_h, hlens, ys_in, deterministic=True)
    det1 = dec1.apply(variables, enc_h, hlens, ys_in, deterministic=True)
    assert np.allclose(det0, det1, atol=1e-6)


def test_sampling_probability_half_is_stochastic_but_finite():
    dec, enc_h, hlens, ys_in = _setup(0.5)
    variables = dec.init(jax.random.PRNGKey(0), enc_h, hlens, ys_in)

    def run(seed):
        return dec.apply(
            variables, enc_h, hlens, ys_in, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampling": jax.random.PRNGKey(seed)},
        )

    a, b = run(3), run(4)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(a, b)  # different coin flips -> different paths


def test_gradient_flows_with_sampling():
    dec, enc_h, hlens, ys_in = _setup(0.7)
    variables = dec.init(jax.random.PRNGKey(0), enc_h, hlens, ys_in)

    def loss(params):
        out = dec.apply(
            {"params": params}, enc_h, hlens, ys_in, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampling": jax.random.PRNGKey(2)},
        )
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    gn = float(
        jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g)))
    )
    assert np.isfinite(gn) and gn > 0
