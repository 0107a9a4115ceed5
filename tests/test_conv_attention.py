"""Conv-attention variants (lightconv/dynamicconv 1D+2D) and positionwise
conv layers — reference transformer/{lightconv,lightconv2d,dynamic_conv,
dynamic_conv2d,multi_layer_conv}.py, selectable like
--transformer-{encoder,decoder}-selfattn-layer-type."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.layers.lightconv import (
    DynamicConvolution,
    DynamicConvolution2D,
    LightweightConvolution,
    LightweightConvolution2D,
    parse_kernel_length,
)


ALL_VARIANTS = [
    LightweightConvolution,
    DynamicConvolution,
    LightweightConvolution2D,
    DynamicConvolution2D,
]


@pytest.mark.parametrize("cls", ALL_VARIANTS)
def test_conv_attention_forward_grad(cls):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 16).astype(np.float32))
    mod = cls(wshare=4, kernel_size=5)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x)
    out = mod.apply(variables, x, x, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: mod.apply({"params": p}, x, x, x).sum())(
        variables["params"]
    )
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize("cls", ALL_VARIANTS)
def test_conv_attention_causal(cls):
    """causal=True (reference use_kernel_mask): output at t must not
    change when a future input changes."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 16).astype(np.float32))
    mod = cls(wshare=4, kernel_size=5, causal=True)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x)
    out = mod.apply(variables, x, x, x)
    x2 = x.at[:, 7:].set(jnp.asarray(rng.randn(1, 3, 16), jnp.float32))
    out2 = mod.apply(variables, x2, x2, x2)
    np.testing.assert_allclose(
        np.asarray(out[:, :7]), np.asarray(out2[:, :7]), atol=1e-5
    )
    # and the non-causal variant DOES leak future context
    mod_nc = cls(wshare=4, kernel_size=5, causal=False)
    v_nc = mod_nc.init(jax.random.PRNGKey(0), x, x, x)
    a = mod_nc.apply(v_nc, x, x, x)
    b = mod_nc.apply(v_nc, x2, x2, x2)
    assert np.abs(np.asarray(a[:, 5:7]) - np.asarray(b[:, 5:7])).max() > 1e-6


def test_parse_kernel_length():
    assert parse_kernel_length(None, 0) == 15
    assert parse_kernel_length(7, 3) == 7
    assert parse_kernel_length("11_13_15", 1) == 13
    assert parse_kernel_length("11_13_15", 9) == 15  # clamp to last


@pytest.mark.parametrize(
    "layer_type", ["lightconv", "lightconv2d", "dynamicconv", "dynamicconv2d"]
)
def test_transformer_encoder_conv_selfattn(layer_type):
    from espnet_tpu.models.asr.transformer_encoder import TransformerEncoder

    enc = TransformerEncoder(
        attention_dim=16,
        attention_heads=4,
        linear_units=32,
        num_blocks=2,
        input_layer="linear",
        selfattn_layer_type=layer_type,
        conv_wshare=4,
        conv_kernel_length="3_5",
    )
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 11, 8).astype(np.float32))
    ilens = jnp.asarray([11, 7])
    variables = enc.init(jax.random.PRNGKey(0), xs, ilens)
    hs, olens = enc.apply(variables, xs, ilens)
    assert hs.shape == (2, 11, 16)
    assert np.isfinite(np.asarray(hs)).all()
    # per-layer kernel parsing: layer 0 uses k=3, layer 1 k=5
    p = variables["params"]
    names = sorted(p.keys())
    assert any("TransformerEncoderLayer" in n for n in names)


@pytest.mark.parametrize("pw", ["conv1d", "conv1d-linear"])
def test_transformer_encoder_positionwise_conv(pw):
    from espnet_tpu.models.asr.transformer_encoder import TransformerEncoder

    enc = TransformerEncoder(
        attention_dim=16,
        attention_heads=4,
        linear_units=32,
        num_blocks=2,
        input_layer="linear",
        positionwise_layer_type=pw,
        positionwise_conv_kernel_size=3,
    )
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 9, 8).astype(np.float32))
    ilens = jnp.asarray([9, 6])
    variables = enc.init(jax.random.PRNGKey(0), xs, ilens)
    hs, olens = enc.apply(variables, xs, ilens)
    assert hs.shape == (2, 9, 16)
    assert np.isfinite(np.asarray(hs)).all()


def test_transformer_decoder_conv_selfattn_causal_and_score_prefix():
    from espnet_tpu.models.asr.transformer_decoder import TransformerDecoder

    dec = TransformerDecoder(
        vocab_size=11,
        attention_dim=16,
        attention_heads=4,
        linear_units=32,
        num_blocks=2,
        selfattn_layer_type="lightconv",
        conv_kernel_length=5,
    )
    rng = np.random.RandomState(2)
    memory = jnp.asarray(rng.randn(2, 7, 16).astype(np.float32))
    mlens = jnp.asarray([7, 5])
    ys = jnp.asarray(rng.randint(0, 11, (2, 6)))
    variables = dec.init(jax.random.PRNGKey(0), memory, mlens, ys)
    logits = dec.apply(variables, memory, mlens, ys)
    assert logits.shape == (2, 6, 11)
    # causality through the whole decoder: changing ys[:, 4:] must not
    # change logits at positions < 4
    ys2 = ys.at[:, 4:].set((ys[:, 4:] + 3) % 11)
    logits2 = dec.apply(variables, memory, mlens, ys2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :4]), np.asarray(logits2[:, :4]), atol=1e-5
    )
    # score_prefix path (the conv decoder's decode path) runs
    lp = dec.apply(
        variables, memory, mlens, ys, jnp.asarray(3), method="score_prefix"
    )
    assert lp.shape == (2, 11)
    assert np.isfinite(np.asarray(lp)).all()
