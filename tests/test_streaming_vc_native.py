"""Streaming decode, VC-Tacotron2, and native editdistance tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import ASRModel, RNNEncoder


def _tiny_asr(v=7):
    enc = RNNEncoder(elayers=1, eunits=12, eprojs=12)
    model = ASRModel(vocab_size=v, encoder=enc, decoder=None, ctc_weight=1.0)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 30, 6).astype(np.float32))
    ys = jnp.asarray(rng.randint(1, v - 1, (1, 4)).astype(np.int32))
    variables = model.init(
        jax.random.PRNGKey(0), feats, jnp.array([30]), ys, jnp.array([4])
    )
    return model, variables


def test_window_streaming_runs():
    from espnet_tpu.search.streaming import WindowStreamingASR

    model, variables = _tiny_asr()
    s = WindowStreamingASR(model, variables, hop_frames=10)
    rng = np.random.RandomState(1)
    hyp1 = s.accept_input(rng.randn(10, 6).astype(np.float32))
    hyp2 = s.accept_input(rng.randn(10, 6).astype(np.float32))
    assert isinstance(hyp1, list) and isinstance(hyp2, list)


def test_segment_streaming_closes_segments():
    from espnet_tpu.search.streaming import SegmentStreamingASR

    model, variables = _tiny_asr()
    s = SegmentStreamingASR(model, variables, min_blank_dur=1)
    rng = np.random.RandomState(2)
    outs = []
    for _ in range(6):
        r = s.accept_input(rng.randn(8, 6).astype(np.float32))
        if r is not None:
            outs.append(r)
    # at least ran without error; segments may or may not close on random data
    assert all(isinstance(o, list) for o in outs)


@pytest.mark.slow
def test_vc_tacotron2_forward_backward():
    from espnet_tpu.models.tts.vc_tacotron2 import VCTacotron2

    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(2, 14, 8).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 10, 6).astype(np.float32))
    model = VCTacotron2(
        idim=8, n_mels=6, econv_chans=8, blstm_units=8, dunits=8,
        dlayers=1, prenet_units=4, postnet_chans=8, att_dim=4,
        aconv_chans=2, aconv_filts=2,
    )
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
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_native_editdistance_matches_python():
    try:
        from espnet_tpu.native import editdistance as ed

        d = ed.distance("kitten", "sitting")
    except ImportError:
        pytest.skip("g++ unavailable")
    assert d == 3
    assert ed.distance([1, 2, 3], [1, 3]) == 1
    assert ed.align_ops(list("kitten"), list("sitting"))[1:] == (2, 0, 1)
    # metrics layer picks up the native path transparently
    from espnet_tpu.utils.metrics import edit_distance

    assert edit_distance("abcdef", "azced") == 3


def test_segment_streaming_flush():
    """End-of-stream flush decodes the open segment (CLI parity for
    --streaming_mode segment)."""
    from espnet_tpu.search.streaming import SegmentStreamingASR

    model, variables = _tiny_asr()
    s = SegmentStreamingASR(model, variables, min_blank_dur=10**6)
    rng = np.random.RandomState(0)
    out = s.accept_input(rng.randn(30, 6).astype(np.float32))
    assert out is None  # blank threshold unreachable, segment stays open
    tail = s.flush()
    assert tail is None or isinstance(tail, list)
    assert s.buf is None  # buffer consumed
