"""Voice Transformer Network (models/tts/vc_transformer.py, reference
e2e_vc_transformer.py:34) — forward/backward, encoder frame stacking,
inference protocol, task selection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _model(**kw):
    from espnet_tpu.models.tts.vc_transformer import VCTransformer

    defaults = dict(
        idim=8, n_mels=6, adim=16, aheads=2, elayers=1, eunits=16,
        dlayers=1, dunits=16, prenet_units=4, postnet_layers=2,
    )
    defaults.update(kw)
    return VCTransformer(**defaults)


def test_vc_transformer_forward_backward():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 14, 8).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 10, 6).astype(np.float32))
    model = _model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, jnp.array([14, 10]), tgt, jnp.array([10, 7]),
    )

    def loss_fn(p):
        loss, stats = model.apply(
            {"params": p}, src, jnp.array([14, 10]), tgt, jnp.array([10, 7]),
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_vc_transformer_encoder_reduction_factor():
    """erf=2 stacks source frames: encoder memory has T//2 positions."""
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(2, 14, 8).astype(np.float32))
    model = _model(encoder_reduction_factor=2)
    tgt = jnp.asarray(rng.randn(2, 10, 6).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, jnp.array([14, 10]), tgt, jnp.array([10, 8]),
    )
    mem, mem_lens = model.apply(
        variables, src, jnp.array([14, 10]), True, method="_encode",
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert mem.shape == (2, 7, 16)
    assert list(np.asarray(mem_lens)) == [7, 5]


def test_vc_transformer_inference_protocol():
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(1, 12, 8).astype(np.float32))
    model = _model(reduction_factor=2)
    tgt = jnp.asarray(rng.randn(1, 10, 6).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, jnp.array([12]), tgt, jnp.array([10]),
    )
    feats, olens, att = model.apply(
        variables, src, jnp.array([12]), method="inference",
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert feats.ndim == 3 and feats.shape[-1] == 6
    assert np.isfinite(np.asarray(feats)).all()
    assert olens.shape == (1,)


def test_vc_task_selects_transformer():
    from espnet_tpu.tasks.vc import DEFAULT_CONFIG, build_vc_model

    cfg = dict(DEFAULT_CONFIG)
    cfg["vc_model"] = "transformer"
    cfg["feats_extract_conf"] = {
        "fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 10,
    }
    cfg["vc_conf"] = {
        "adim": 8, "aheads": 2, "elayers": 1, "eunits": 8, "dlayers": 1,
        "dunits": 8, "prenet_units": 4, "postnet_layers": 1,
    }
    model = build_vc_model(cfg)
    assert model.vc.__class__.__name__ == "VCTransformer"
    rng = np.random.RandomState(3)
    wav_s = jnp.asarray(rng.randn(2, 2000).astype(np.float32))
    wav_t = jnp.asarray(rng.randn(2, 1800).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav_s, jnp.array([2000, 1500]), wav_t, jnp.array([1800, 1400]),
    )
    loss, stats = model.apply(
        variables, wav_s, jnp.array([2000, 1500]), wav_t,
        jnp.array([1800, 1400]), rngs={"dropout": jax.random.PRNGKey(2)},
        deterministic=False,
    )
    assert np.isfinite(float(loss))

    with pytest.raises(ValueError):
        bad = dict(cfg)
        bad["vc_model"] = "nope"
        build_vc_model(bad)
