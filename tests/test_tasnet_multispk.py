"""Conv-TasNet, PIT multi-speaker ASR, multi-encoder ASR tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import RNNEncoder, TransformerDecoder, TransformerEncoder

V = 8


@pytest.mark.slow
def test_conv_tasnet_forward_backward():
    from espnet_tpu.models.enh import EnhancementModel
    from espnet_tpu.models.enh.tasnet import ConvTasNet

    rng = np.random.RandomState(0)
    b, n = 2, 800
    s1 = rng.randn(b, n).astype(np.float32) * 0.3
    s2 = rng.randn(b, n).astype(np.float32) * 0.3
    mix = jnp.asarray(s1 + s2)
    refs = jnp.asarray(np.stack([s1, s2], axis=1))
    lens = jnp.array([n, n - 100])
    model = EnhancementModel(
        separator=ConvTasNet(
            n_spk=2, enc_filters=16, enc_kernel=16, bottleneck=8, hidden=16,
            tcn_layers=2, tcn_stacks=1,
        ),
        n_spk=2,
    )
    variables = model.init(jax.random.PRNGKey(0), mix, lens, refs)
    loss, grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, mix, lens, refs)[0]
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.slow
def test_pit_ctc_asr():
    from espnet_tpu.models.asr.multispeaker import PITCTCASRModel

    rng = np.random.RandomState(1)
    b, t, d = 2, 24, 10
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    ilens = jnp.array([t, t - 6])
    text = jnp.asarray(rng.randint(1, V - 1, (b, 2, 4)).astype(np.int32))
    tlens = jnp.asarray(np.full((b, 2), 4, dtype=np.int32))
    front = RNNEncoder(elayers=1, eunits=12, eprojs=12)
    branches = [
        RNNEncoder(elayers=1, eunits=12, eprojs=12),
        RNNEncoder(elayers=1, eunits=12, eprojs=12),
    ]
    model = PITCTCASRModel(
        vocab_size=V, encoder_front=front, encoder_branches=branches
    )
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, text, tlens)
    loss, grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, feats, ilens, text, tlens)[0]
    )(variables["params"])
    assert np.isfinite(float(loss))
    # PIT: swapping reference speakers must not change the loss
    text_sw = text[:, ::-1]
    loss_sw, _ = model.apply(variables, feats, ilens, text_sw, tlens[:, ::-1])
    np.testing.assert_allclose(float(loss), float(loss_sw), rtol=1e-5)


def test_multi_encoder_asr():
    from espnet_tpu.models.asr.multispeaker import MultiEncoderASRModel

    rng = np.random.RandomState(2)
    b = 2
    s1 = jnp.asarray(rng.randn(b, 20, 8).astype(np.float32))
    s2 = jnp.asarray(rng.randn(b, 16, 6).astype(np.float32))
    l1, l2 = jnp.array([20, 14]), jnp.array([16, 10])
    text = jnp.asarray(rng.randint(1, V - 1, (b, 3)).astype(np.int32))
    tlens = jnp.array([3, 2])
    encs = [
        TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                           num_blocks=1, input_layer="linear"),
        TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                           num_blocks=1, input_layer="linear"),
    ]
    dec = TransformerDecoder(V, attention_dim=16, attention_heads=2,
                             linear_units=16, num_blocks=1)
    model = MultiEncoderASRModel(vocab_size=V, encoders=encs, decoder=dec)
    variables = model.init(
        jax.random.PRNGKey(0), [s1, s2], [l1, l2], text, tlens
    )
    loss, stats = model.apply(variables, [s1, s2], [l1, l2], text, tlens)
    assert np.isfinite(float(loss))
    assert "loss_ctc0" in stats and "loss_ctc1" in stats


@pytest.mark.slow
def test_pit_task_pipeline(tmp_path):
    """model_type: pit through the ASR task: raw mixture wavs +
    per-speaker texts → PIT CTC training → branch decode (reference
    egs/mini_an4/asr_mix1 CI analog)."""
    import os
    import subprocess
    import sys

    from espnet_tpu.data.wav import write_wav

    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    (d / "wav").mkdir(parents=True)
    words = ["AB", "BA", "ABB"]
    scp, t1, t2 = [], [], []
    for i in range(6):
        w = rng.randn(3200).astype(np.float32) * 0.1
        write_wav(d / "wav" / f"m{i}.wav", 8000, w)
        scp.append(f"m{i} {d}/wav/m{i}.wav")
        t1.append(f"m{i} {words[i % 3]}")
        t2.append(f"m{i} {words[(i + 1) % 3]}")
    (d / "wav.scp").write_text("\n".join(scp))
    (d / "text_spk1").write_text("\n".join(t1))
    (d / "text_spk2").write_text("\n".join(t2))
    (d / "tokens.txt").write_text("\n".join(
        ["<blank>", "<unk>", "A", "B", "<space>", "<sos/eos>"]))

    env = {**os.environ, "PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "espnet_tpu.bin.asr_train",
         "--train_data", f"{d}/wav.scp,speech,sound",
         "--train_data", f"{d}/text_spk1,text_spk1,text",
         "--train_data", f"{d}/text_spk2,text_spk2,text",
         "--valid_data", f"{d}/wav.scp,speech,sound",
         "--valid_data", f"{d}/text_spk1,text_spk1,text",
         "--valid_data", f"{d}/text_spk2,text_spk2,text",
         "--token_list", str(d / "tokens.txt"),
         "--expdir", str(tmp_path / "exp"),
         "--model_type", "pit", "--n_spk", "2",
         "--frontend", "default",
         "--frontend_conf", '{"fs": 8000, "n_fft": 256, "hop_length": 128, "n_mels": 20}',
         "--normalize", "utterance_mvn",
         "--encoder", "rnn",
         "--encoder_conf", '{"elayers": 1, "eunits": 16, "eprojs": 16}',
         "--branch_conf", '{"elayers": 1, "eunits": 16, "eprojs": 16}',
         "--max_epoch", "2", "--batch_size", "3"],
        env=env, capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "espnet_tpu.bin.asr_recog",
         "--data", f"{d}/wav.scp,speech,sound",
         "--config", str(tmp_path / "exp" / "config.yaml"),
         "--ckpt", str(tmp_path / "exp" / "latest.ckpt"),
         "--output_dir", str(tmp_path / "exp" / "decode"), "--batch_size", "3"],
        env=env, capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    text = (tmp_path / "exp" / "decode" / "text").read_text()
    assert "_spk1 " in text and "_spk2 " in text
