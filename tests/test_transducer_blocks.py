"""Transducer block library + transformer prediction net (reference:
transducer/blocks.py:463 build_blocks, transformer_decoder.py,
tdnn.py, causal_conv1d.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.transducer.blocks import (
    BlockEncoder,
    TransformerPredictionNet,
    freeze_blocks,
)
from espnet_tpu.models.transducer.model import TransducerModel


def test_block_encoder_mixed_arch():
    """TDNN (subsample ×2) → transformer → conformer mixed stack."""
    blocks = freeze_blocks([
        {"type": "tdnn", "odim": 16, "ctx_size": 3, "stride": 2},
        {"type": "transformer", "d_hidden": 16, "heads": 2, "units": 32},
        {"type": "conformer", "d_hidden": 16, "heads": 2, "units": 32,
         "kernel_size": 7},
    ])
    enc = BlockEncoder(blocks=blocks)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 20, 8).astype(np.float32))
    ilens = jnp.asarray([20, 14])
    v = enc.init(jax.random.PRNGKey(0), xs, ilens)
    out, olens = enc.apply(v, xs, ilens)
    assert out.shape == (2, 10, 16)  # ×2 subsample
    np.testing.assert_array_equal(np.asarray(olens), [10, 7])
    assert np.isfinite(np.asarray(out)).all()
    # padded region zeroed
    assert np.allclose(np.asarray(out)[1, 7:], 0.0)


def test_causal_conv_block_is_causal():
    from espnet_tpu.models.transducer.blocks import CausalConv1dBlock

    blk = CausalConv1dBlock(odim=8, kernel_size=3)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(1, 10, 8).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), xs, jnp.asarray([10]))
    y1, _ = blk.apply(v, xs, jnp.asarray([10]))
    # perturb a future frame — outputs before it must not change
    xs2 = xs.at[0, 7].set(99.0)
    y2, _ = blk.apply(v, xs2, jnp.asarray([10]))
    np.testing.assert_allclose(np.asarray(y1)[0, :7], np.asarray(y2)[0, :7],
                               rtol=1e-6)
    assert not np.allclose(np.asarray(y1)[0, 7:], np.asarray(y2)[0, 7:])


def test_transformer_prediction_net_step_matches_batch():
    """step() over a prefix reproduces __call__'s hidden at each u."""
    net = TransformerPredictionNet(
        vocab_size=9, dunits=12, layers=1, heads=2, units=24,
        max_decode_len=8, dropout_rate=0.0,
    )
    labels = jnp.asarray([[3, 5, 2, 7]], dtype=jnp.int32)
    v = net.init(jax.random.PRNGKey(0), labels)
    g_all = net.apply(v, labels)  # (1, 5, D): g_u conditions on labels[<u]

    carry = net.apply(v, 1, method="init_carry")
    tokens = [0, 3, 5, 2, 7]  # blank start then labels
    for u, tok in enumerate(tokens):
        carry, g = net.apply(
            v, carry, jnp.asarray([tok], jnp.int32), method="step"
        )
        np.testing.assert_allclose(
            np.asarray(g)[0], np.asarray(g_all)[0, u], rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_transducer_model_transformer_pred_end_to_end():
    from espnet_tpu.models.asr import RNNEncoder
    from espnet_tpu.search.transducer import transducer_greedy_decode

    model = TransducerModel(
        vocab_size=7, encoder=RNNEncoder(elayers=1, eunits=12, eprojs=12),
        dunits=12, joint_dim=12, pred_type="transformer",
        pred_heads=2, pred_units=24,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 14, 6).astype(np.float32)
    flens = np.array([14, 10], np.int32)
    ys = rng.randint(1, 6, size=(2, 4)).astype(np.int32)
    ylens = np.array([4, 3], np.int32)
    v = model.init(jax.random.PRNGKey(0), feats, flens, ys, ylens)
    loss, stats = model.apply(v, feats, flens, ys, ylens)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply({"params": p}, feats, flens, ys, ylens)[0]
    )(v["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # greedy decode runs through the step API
    hs, hlens = model.apply(v, feats, flens, method="encode")
    ids, lens = transducer_greedy_decode(model, v, hs, hlens)
    assert np.asarray(ids).shape[0] == 2


def test_custom_encoder_via_task_config():
    from espnet_tpu.tasks.asr import build_model

    config = {
        "encoder": "custom",
        "encoder_conf": {
            "blocks": [
                {"type": "tdnn", "odim": 12, "ctx_size": 3, "stride": 2},
                {"type": "transformer", "d_hidden": 12, "heads": 2, "units": 24},
            ],
        },
        "model_type": "transducer",
        "model_conf": {"dunits": 12, "joint_dim": 12},
        "input_size": 6,
    }
    model = build_model(config, vocab_size=7)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 12, 6).astype(np.float32)
    flens = np.array([12, 8], np.int32)
    ys = rng.randint(1, 6, size=(2, 3)).astype(np.int32)
    ylens = np.array([3, 2], np.int32)
    v = model.init(jax.random.PRNGKey(0), feats, flens, ys, ylens)
    loss, _ = model.apply(v, feats, flens, ys, ylens)
    assert np.isfinite(float(loss))
