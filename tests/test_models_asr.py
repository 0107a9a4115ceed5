"""Tiny-model forward/backward tests for the ASR model family
(pattern from reference test/test_e2e_asr.py:28-60)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import (
    ASRModel,
    ConformerEncoder,
    RNNDecoder,
    RNNEncoder,
    TransformerDecoder,
    TransformerEncoder,
)
from espnet_tpu.models.asr.espnet_model import add_sos_eos

B, T, D, V = 2, 34, 20, 11


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    ilens = jnp.array([T, T - 10])
    ys = jnp.asarray(rng.randint(1, V - 1, size=(B, 5)).astype(np.int32))
    ys = ys.at[1, 3:].set(-1)
    ylens = jnp.array([5, 3])
    return xs, ilens, ys, ylens


def test_add_sos_eos():
    _, _, ys, ylens = _batch()
    ys_in, ys_out = add_sos_eos(ys, ylens, V - 1, V - 1)
    assert ys_in.shape == (B, 6) and ys_out.shape == (B, 6)
    assert int(ys_in[0, 0]) == V - 1
    assert int(ys_out[0, 5]) == V - 1  # eos at ylen
    assert int(ys_out[1, 3]) == V - 1
    assert int(ys_out[1, 4]) == -1  # ignore beyond


@pytest.mark.parametrize(
    "enc",
    [
        TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16, num_blocks=2),
        ConformerEncoder(attention_dim=16, attention_heads=2, linear_units=16, num_blocks=2, cnn_kernel=7),
        RNNEncoder(elayers=2, eunits=8, eprojs=16, subsample=(1, 2, 2)),
        RNNEncoder(elayers=1, eunits=8, eprojs=16, use_vgg=True),
        RNNEncoder(elayers=1, eunits=8, eprojs=16, use_projection=False),
        RNNEncoder(elayers=1, eunits=8, eprojs=16, cell_type="gru", bidirectional=False),
    ],
)
def test_encoders(enc):
    xs, ilens, _, _ = _batch()
    params = enc.init(jax.random.PRNGKey(0), xs, ilens)
    hs, hlens = enc.apply(params, xs, ilens)
    assert hs.shape[0] == B and hs.shape[2] == 16
    assert np.isfinite(np.asarray(hs)).all()
    assert int(hlens[0]) <= hs.shape[1]


@pytest.mark.slow
@pytest.mark.parametrize("dec_type", ["transformer", "rnn"])
@pytest.mark.parametrize("ctc_weight", [0.0, 0.5, 1.0])
def test_asr_model_loss_and_grad(dec_type, ctc_weight):
    xs, ilens, ys, ylens = _batch()
    enc = TransformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1
    )
    if dec_type == "transformer":
        dec = TransformerDecoder(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    else:
        dec = RNNDecoder(V, dunits=16, dlayers=1, att_dim=16, aconv_chans=2, aconv_filts=3)
    model = ASRModel(
        vocab_size=V, encoder=enc, decoder=None if ctc_weight == 1.0 else dec,
        ctc_weight=ctc_weight, lsm_weight=0.1,
    )
    variables = model.init(jax.random.PRNGKey(0), xs, ilens, ys, ylens)

    def loss_fn(params):
        loss, stats = model.apply(
            {"params": params}, xs, ilens, ys, ylens,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)},
        )
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    if ctc_weight not in (0.0, 1.0):
        assert "loss_ctc" in stats and "loss_att" in stats


def test_asr_model_with_frontend_and_specaug():
    from espnet_tpu.models.asr.frontend import DefaultFrontend, GlobalMVN

    rng = np.random.RandomState(5)
    speech = jnp.asarray(rng.randn(B, 2000).astype(np.float32))
    slens = jnp.array([2000, 1500])
    ys = jnp.asarray(rng.randint(1, V - 1, size=(B, 4)).astype(np.int32))
    ylens = jnp.array([4, 2])
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    dec = TransformerDecoder(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = ASRModel(
        vocab_size=V,
        encoder=enc,
        decoder=dec,
        frontend=DefaultFrontend(n_fft=128, hop_length=64, n_mels=20),
        normalize=GlobalMVN(feat_dim=20),
        use_specaug=True,
        specaug_conf=(
            ("time_warp_window", 2),
            ("freq_mask_width_range", (0, 5)),
            ("time_mask_width_range", (0, 5)),
        ),
        ctc_weight=0.3,
    )
    variables = model.init(jax.random.PRNGKey(0), speech, slens, ys, ylens)
    assert "norm_stats" in variables
    loss, stats = model.apply(
        variables, speech, slens, ys, ylens,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))


@pytest.mark.parametrize(
    "att_type",
    ["noatt", "dot", "add", "location", "coverage", "coverage_location",
     "multi_head_dot", "forward"],
)
def test_rnn_decoder_attention_variants(att_type):
    xs, ilens, ys, ylens = _batch(seed=7)
    enc = RNNEncoder(elayers=1, eunits=8, eprojs=16)
    dec = RNNDecoder(V, dunits=16, dlayers=1, att_dim=16, aconv_chans=2,
                     aconv_filts=3, att_type=att_type)
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=0.0)
    variables = model.init(jax.random.PRNGKey(0), xs, ilens, ys, ylens)
    loss, stats = model.apply(variables, xs, ilens, ys, ylens)
    assert np.isfinite(float(loss)), att_type
    g = jax.grad(
        lambda p: model.apply({"params": p}, xs, ilens, ys, ylens)[0]
    )(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_conformer_remat_forward_backward():
    xs, ilens, _, _ = _batch(seed=11)
    enc_r = ConformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=16,
        num_blocks=2, cnn_kernel=7, remat=True,
    )
    v = enc_r.init(jax.random.PRNGKey(0), xs, ilens)
    h, _ = enc_r.apply(v, xs, ilens)
    assert np.isfinite(np.asarray(h)).all()
    g = jax.grad(lambda p: enc_r.apply({"params": p}, xs, ilens)[0].sum())(
        v["params"]
    )
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )
