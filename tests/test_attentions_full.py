"""All 14 attention variants through the common step contract (reference
analog: test/test_e2e_asr.py parametrized over atype + att_for factory,
rnn/attentions.py:1661)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr.attentions import AttForwardTA, att_for
from espnet_tpu.utils.masks import make_non_pad_mask

ALL_TYPES = [
    "noatt", "dot", "add", "location", "location2d", "location_recurrent",
    "coverage", "coverage_location", "multi_head_dot", "multi_head_add",
    "multi_head_loc", "multi_head_multi_res_loc", "forward", "forward_ta",
]


@pytest.mark.parametrize("atype", ALL_TYPES)
def test_attention_step(atype):
    b, t, d = 2, 11, 16
    att = att_for(atype, att_dim=16, aconv_chans=4, aconv_filts=3, n_head=2)
    rng = np.random.RandomState(0)
    enc_h = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    hlens = jnp.asarray(np.array([11, 7], dtype=np.int32))
    dec_z = jnp.asarray(rng.randn(b, 24).astype(np.float32))
    out_prev = jnp.asarray(rng.randn(b, 8).astype(np.float32))
    mask = make_non_pad_mask(hlens, t)

    def run(params=None):
        def fwd(mdl):
            enc_proj = mdl.pre_compute(enc_h)
            state = mdl.init_state(b, t, hlens)
            kw = {"out_prev": out_prev} if atype == "forward_ta" else {}
            c1, state = mdl(enc_h, enc_proj, mask, dec_z, state, **kw)
            c2, state = mdl(enc_h, enc_proj, mask, dec_z, state, **kw)
            return c1, c2, state

        if params is None:
            return att.init_with_output(jax.random.PRNGKey(0), method=fwd)
        return att.apply(params, method=fwd)

    (c1, c2, state), params = run()
    assert np.isfinite(np.asarray(c1)).all()
    assert np.isfinite(np.asarray(c2)).all()
    # context dims: plain variants return eproj-dim; multi-head return
    # mlp_o output
    assert c1.shape[0] == b

    # weights in state respect masking (no attention on padded frames)
    cumulative = atype in ("coverage", "coverage_location")

    def check_weights(x):
        x = np.asarray(x)
        if x.ndim == 2 and x.shape == (b, t):
            assert np.allclose(x[1, 7:], 0.0, atol=1e-6), atype
            if not cumulative:  # coverage states are running sums
                np.testing.assert_allclose(x.sum(-1), 1.0, rtol=1e-4)
        if x.ndim == 3 and x.shape[0] == b and x.shape[-1] == t:
            assert np.allclose(x[1, :, 7:], 0.0, atol=1e-6), atype

    jax.tree_util.tree_map(check_weights, state)


def test_forward_ta_transition_prob_updates():
    b, t, d = 2, 9, 12
    att = AttForwardTA(att_dim=12, aconv_chans=4, aconv_filts=3)
    rng = np.random.RandomState(0)
    enc_h = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    hlens = jnp.asarray(np.array([9, 9], dtype=np.int32))
    dec_z = jnp.asarray(rng.randn(b, 10).astype(np.float32))
    out = jnp.asarray(rng.randn(b, 5).astype(np.float32))
    mask = make_non_pad_mask(hlens, t)

    def fwd(mdl):
        proj = mdl.pre_compute(enc_h)
        state = mdl.init_state(b, t, hlens)
        p0 = state[1]
        _, state = mdl(enc_h, proj, mask, dec_z, state, out_prev=out)
        return p0, state[1], state[0]

    (p0, p1, alpha), _ = att.init_with_output(jax.random.PRNGKey(0), method=fwd)
    assert np.allclose(np.asarray(p0), 0.5)
    assert not np.allclose(np.asarray(p1), 0.5)  # agent updated
    assert 0.0 < float(np.asarray(p1).min()) < 1.0
    # monotonic prior: mass starts focused at frame 0, spreads forward
    a = np.asarray(alpha)
    assert a[:, :3].sum(-1).min() > 0.5


@pytest.mark.slow
@pytest.mark.parametrize("atype", ["forward", "forward_ta"])
def test_tacotron2_with_selectable_attention(atype):
    """Tacotron2 trains and synthesizes with forward/forward_ta attention
    (reference default atype, e2e_tts_tacotron2.py:378)."""
    from espnet_tpu.models.tts.tacotron2 import Tacotron2

    model = Tacotron2(
        vocab_size=10, n_mels=8, embed_dim=16, enc_conv_layers=1,
        enc_conv_chans=16, enc_blstm_units=16, dunits=16, dlayers=1,
        prenet_units=8, postnet_chans=8, att_dim=8, aconv_chans=4,
        aconv_filts=3, reduction_factor=2, att_type=atype,
    )
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 9, (2, 6)).astype(np.int32))
    tlens = jnp.asarray(np.array([6, 4], dtype=np.int32))
    feats = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    flens = jnp.asarray(np.array([12, 8], dtype=np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, feats, flens,
    )

    def loss_fn(params):
        loss, stats = model.apply(
            {"params": params}, text, tlens, feats, flens,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads))
        )
    )
    assert np.isfinite(gnorm) and gnorm > 0

    out, olens, att_ws = model.apply(
        variables, text, tlens, method="inference",
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert out.shape[-1] == 8
    assert np.isfinite(np.asarray(out)).all()
