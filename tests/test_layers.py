"""Layer unit tests (tiny dims, CPU) mirroring the reference's tiny-model
test pattern (test/test_e2e_asr.py)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.layers.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    rel_shift,
)
from espnet_tpu.layers.embedding import RelPositionalEncoding, sinusoidal_table
from espnet_tpu.layers.subsampling import Conv2dSubsampling


def test_rel_shift_matches_gather():
    rng = np.random.RandomState(0)
    b, h, t = 2, 3, 5
    x = jnp.asarray(rng.randn(b, h, t, 2 * t - 1).astype(np.float32))
    out = np.asarray(rel_shift(x))
    xn = np.asarray(x)
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(
                out[:, :, i, j], xn[:, :, i, (t - 1) - i + j], rtol=1e-6
            )


def test_rel_shift_matrix_matches_rel_shift():
    """The one-hot contraction used in the attention layer must equal the
    classic pad/reshape rel_shift applied to the scores."""
    from espnet_tpu.layers.attention import rel_shift_matrix

    rng = np.random.RandomState(1)
    b, h, t = 2, 3, 6
    q_v = jnp.asarray(rng.randn(b, t, h, 4).astype(np.float32))
    p = jnp.asarray(rng.randn(2 * t - 1, h, 4).astype(np.float32))
    legacy = rel_shift(jnp.einsum("bqhd,phd->bhqp", q_v, p))
    shift = rel_shift_matrix(t, t, 2 * t - 1, jnp.float32)
    got = jnp.einsum("bqhd,qjhd->bhqj", q_v, jnp.einsum("qjp,phd->qjhd", shift, p))
    np.testing.assert_allclose(np.asarray(got), np.asarray(legacy), atol=1e-5)


def test_mha_masking():
    mha = MultiHeadedAttention(n_head=2, n_feat=8)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 8).astype(np.float32))
    mask = jnp.array([[True, True, False, False], [True] * 4])[:, None, :]
    params = mha.init(jax.random.PRNGKey(0), x, x, x, mask)
    out, attn = mha.apply(params, x, x, x, mask, return_attn=True)
    attn = np.asarray(attn)
    assert np.all(attn[0, :, :, 2:] == 0.0)
    np.testing.assert_allclose(attn.sum(-1), 1.0, rtol=1e-5)
    assert out.shape == (2, 4, 8)


def test_rel_mha_shapes():
    mha = RelPositionMultiHeadedAttention(n_head=2, n_feat=8)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 8).astype(np.float32))
    pe_mod = RelPositionalEncoding(8, 0.0)
    pe_params = pe_mod.init(jax.random.PRNGKey(0), x)
    xs, pos_emb = pe_mod.apply(pe_params, x)
    assert pos_emb.shape == (1, 11, 8)
    params = mha.init(jax.random.PRNGKey(1), xs, xs, xs, pos_emb)
    out = mha.apply(params, xs, xs, xs, pos_emb)
    assert out.shape == (2, 6, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_conv2d_subsampling_lengths():
    for factor in (4, 6, 8):
        sub = Conv2dSubsampling(odim=8, factor=factor)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 37, 20).astype(np.float32))
        ilens = jnp.array([37, 25])
        params = sub.init(jax.random.PRNGKey(0), x, ilens)
        out, olens = sub.apply(params, x, ilens)
        assert out.shape[0] == 2 and out.shape[2] == 8
        assert int(olens[0]) == out.shape[1]
        assert int(olens[1]) <= out.shape[1]


def test_sinusoidal_table():
    pe = np.asarray(sinusoidal_table(4, 6))
    assert pe.shape == (4, 6)
    np.testing.assert_allclose(pe[0], [0, 1, 0, 1, 0, 1], atol=1e-6)


@pytest.mark.slow
def test_lightconv_and_dynamicconv():
    from espnet_tpu.layers.lightconv import DynamicConvolution, LightweightConvolution

    x = jnp.asarray(np.random.RandomState(4).randn(2, 12, 16).astype(np.float32))
    for mod in [LightweightConvolution(wshare=4, kernel_size=5),
                DynamicConvolution(wshare=4, kernel_size=5)]:
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        g = jax.grad(lambda p: mod.apply({"params": p}, x).sum())(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))
