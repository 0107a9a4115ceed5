"""End-to-end training smoke test: tiny synthetic corpus, RNN and
transformer hybrid CTC/attention models, 2 epochs on the 8-device CPU
mesh — the analog of the reference's ci/test_integration.sh mini_an4 run.
Checks loss decreases, checkpoints + resume + nbest averaging work.
"""
import logging

import jax
import numpy as np
import pytest

from espnet_tpu.data.batching import pad_batch
from espnet_tpu.models.asr import ASRModel, RNNDecoder, RNNEncoder, TransformerEncoder, TransformerDecoder
from espnet_tpu.train.optimizers import build_optimizer
from espnet_tpu.train.trainer import Trainer
from espnet_tpu.train.checkpoint import load_checkpoint

V = 8
B = 8


def synth_batches(n_batches=4, seed=0, t=32, l=6):
    """Synthetic correlated (feats, text) batches, identical across epochs."""
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        ys = rng.randint(1, V - 1, size=(B, l)).astype(np.int32)
        # features weakly encode the labels so the model can learn
        feats = np.zeros((B, t, 10), dtype=np.float32)
        for b in range(B):
            for i, y in enumerate(ys[b]):
                feats[b, i * (t // l): (i + 1) * (t // l), y] = 1.0
        feats += rng.randn(B, t, 10).astype(np.float32) * 0.1
        batches.append(
            dict(
                speech=feats,
                speech_lengths=np.full(B, t, dtype=np.int32),
                text=ys,
                text_lengths=np.full(B, l, dtype=np.int32),
            )
        )
    return batches


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["rnn", "transformer"])
def test_train_loop_loss_decreases(tmp_path, arch):
    if arch == "rnn":
        enc = RNNEncoder(elayers=1, eunits=16, eprojs=16)
        dec = RNNDecoder(V, dunits=16, dlayers=1, att_dim=16, aconv_chans=2, aconv_filts=3)
    else:
        enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1, input_layer="linear")
        dec = TransformerDecoder(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=0.5)
    tx = build_optimizer("adam", lr=1e-2, grad_clip=5.0)
    trainer = Trainer(
        model, tx, expdir=str(tmp_path / "exp"), max_epoch=3, keep_nbest=2,
        log_interval=1000,
    )
    batches = synth_batches()
    b0 = batches[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        b0["speech"], b0["speech_lengths"], b0["text"], b0["text_lengths"],
    )
    state = trainer.init_state(variables)
    state = trainer.run(state, lambda ep: iter(batches), lambda ep: iter(batches[:1]))

    r = trainer.reporter
    first = r.get(1, "train", "loss")
    last = r.get(3, "train", "loss")
    assert last < first, (first, last)

    # checkpoint files + symlinks
    exp = tmp_path / "exp"
    assert (exp / "checkpoint.ckpt").exists()
    assert (exp / "latest.ckpt").exists()
    assert (exp / "valid.loss.best.ckpt").exists()

    # nbest averaging
    avg = trainer.average_best_params(state)
    assert (exp / "avg_2best.ckpt").exists()

    # resume restores reporter + epoch counter
    trainer2 = Trainer(model, tx, expdir=str(exp), max_epoch=3, log_interval=1000)
    state2 = trainer2.init_state(variables)
    state2 = trainer2.resume(state2)
    assert trainer2.start_epoch == 4
    assert trainer2.reporter.get(3, "train", "loss") is not None


def test_nan_skip_does_not_poison(tmp_path):
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1, input_layer="linear")
    model = ASRModel(vocab_size=V, encoder=enc, decoder=None, ctc_weight=1.0)
    tx = build_optimizer("adam", lr=1e-2, skip_nan_grad=True)
    from espnet_tpu.train.train_state import TrainState, make_train_step

    batches = synth_batches(1)
    b = batches[0]
    variables = model.init(
        jax.random.PRNGKey(0), b["speech"], b["speech_lengths"], b["text"], b["text_lengths"]
    )
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    state, _ = step(state, b)
    bad = dict(b, speech=b["speech"] * np.nan)
    state, stats = step(state, bad)
    state, stats2 = step(state, b)
    flat = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert np.isfinite(float(stats2["loss"]))


def test_task_builds_transducer_and_maskctc():
    from espnet_tpu.tasks.asr import build_model
    from espnet_tpu.models.transducer import TransducerModel
    from espnet_tpu.models.asr.maskctc import MaskCTCModel

    cfg_t = {
        "encoder": "rnn", "encoder_conf": {"elayers": 1, "eunits": 8, "eprojs": 8},
        "model_type": "transducer", "model_conf": {"dunits": 8, "joint_dim": 8},
    }
    assert isinstance(build_model(cfg_t, 7), TransducerModel)
    cfg_m = {
        "encoder": "transformer",
        "encoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1,
                         "input_layer": "linear"},
        "decoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1},
        "model_type": "maskctc",
    }
    m = build_model(cfg_m, 9)
    assert isinstance(m, MaskCTCModel)
    assert m.decoder.causal is False


def test_all_nonfinite_steps_abort_epoch(tmp_path):
    """Forcing nan grads: skipped steps are counted and an all-invalid
    epoch aborts (reference espnet2/train/trainer.py:309-314)."""
    import flax.linen as nn
    import jax.numpy as jnp
    import pytest as _pytest

    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.trainer import Trainer

    class NanModel(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            w = self.param("w", nn.initializers.ones, (3,))
            loss = (x * w).sum() * jnp.nan
            return loss, {"loss": loss}

    model = NanModel()
    tx = build_optimizer("adam", lr=1e-2)
    trainer = Trainer(model, tx, expdir=str(tmp_path), max_epoch=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
    state = trainer.init_state(variables)

    def batches(epoch):
        for _ in range(3):
            yield {"x": np.ones((2, 3), np.float32)}

    with _pytest.raises(RuntimeError, match="non-finite"):
        trainer.train_one_epoch(state, batches(1), 1)
