"""Tests for enhancement (PIT SI-SNR separation), ST/MT models, and
Mask-CTC (tiny-model forward/backward + decode smoke, reference
test_e2e_st*.py / test_e2e_mt*.py / test_e2e_asr_maskctc.py pattern)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import TransformerDecoder, TransformerEncoder
from espnet_tpu.models.enh import EnhancementModel, TFMaskingNet, pit_loss, si_snr
from espnet_tpu.models.st_mt import MTModel, STModel


def test_si_snr_properties():
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    assert float(si_snr(ref * 3.0, ref).min()) > 50  # scale invariant
    noisy = ref + 0.5 * jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    assert float(si_snr(noisy, ref).max()) < 20


def test_pit_loss_picks_best_permutation():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    # estimates are swapped relative to refs
    loss, perm = pit_loss([b, a], [a, b])
    loss_direct, _ = pit_loss([a, b], [a, b])
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss_direct), rtol=1e-5)


@pytest.mark.slow
def test_enhancement_model_forward_backward():
    rng = np.random.RandomState(2)
    b, n = 2, 1024
    s1 = rng.randn(b, n).astype(np.float32) * 0.3
    s2 = rng.randn(b, n).astype(np.float32) * 0.3
    mix = jnp.asarray(s1 + s2)
    refs = jnp.asarray(np.stack([s1, s2], axis=1))
    lens = jnp.array([n, n - 200])
    model = EnhancementModel(
        separator=TFMaskingNet(n_spk=2, n_fft=128, hop_length=64, units=16, layers=1),
        n_spk=2,
    )
    variables = model.init(jax.random.PRNGKey(0), mix, lens, refs)

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, mix, lens, refs)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    outs, _ = model.apply(variables, mix, lens, method="separate")
    assert len(outs) == 2 and outs[0].shape[0] == b


def _speech_batch(v_src, rng, b=2, t=20, d=8):
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    ilens = jnp.array([t, t - 5])
    return feats, ilens


def test_st_model():
    rng = np.random.RandomState(3)
    v_tgt, v_src = 9, 7
    feats, ilens = _speech_batch(v_src, rng)
    tgt = jnp.asarray(rng.randint(1, v_tgt - 1, (2, 4)).astype(np.int32))
    src = jnp.asarray(rng.randint(1, v_src - 1, (2, 3)).astype(np.int32))
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                             num_blocks=1, input_layer="linear")
    dec = TransformerDecoder(v_tgt, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    asr_dec = TransformerDecoder(v_src, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = STModel(
        vocab_size=v_tgt, src_vocab_size=v_src, encoder=enc, decoder=dec,
        asr_decoder=asr_dec, asr_weight=0.3, mtlalpha=0.5,
    )
    variables = model.init(
        jax.random.PRNGKey(0), feats, ilens, tgt, jnp.array([4, 3]),
        src, jnp.array([3, 2]),
    )
    loss, stats = model.apply(
        variables, feats, ilens, tgt, jnp.array([4, 3]), src, jnp.array([3, 2])
    )
    assert np.isfinite(float(loss))
    assert {"loss_st", "loss_asr_ctc", "loss_asr_att"} <= set(stats)


def test_mt_model():
    rng = np.random.RandomState(4)
    v_tgt, v_src = 9, 7
    src = jnp.asarray(rng.randint(1, v_src - 1, (2, 5)).astype(np.int32))
    tgt = jnp.asarray(rng.randint(1, v_tgt - 1, (2, 4)).astype(np.int32))
    enc = TransformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1,
        input_layer="embed", vocab_size=v_src,
    )
    dec = TransformerDecoder(v_tgt, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = MTModel(vocab_size=v_tgt, encoder=enc, decoder=dec)
    variables = model.init(
        jax.random.PRNGKey(0), src, jnp.array([5, 3]), tgt, jnp.array([4, 2])
    )
    loss, stats = model.apply(variables, src, jnp.array([5, 3]), tgt, jnp.array([4, 2]))
    assert np.isfinite(float(loss))
    assert "acc" in stats


@pytest.mark.slow
def test_maskctc_train_and_decode():
    from espnet_tpu.models.asr.maskctc import MaskCTCModel, maskctc_recognize

    rng = np.random.RandomState(5)
    v = 10  # mask = 9, eos = 8
    feats, ilens = _speech_batch(v, rng)
    ys = jnp.asarray(rng.randint(1, 8, (2, 4)).astype(np.int32))
    ylens = jnp.array([4, 3])
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                             num_blocks=1, input_layer="linear")
    dec = TransformerDecoder(v, attention_dim=16, attention_heads=2, linear_units=16,
                             num_blocks=1, causal=False)
    model = MaskCTCModel(vocab_size=v, encoder=enc, decoder=dec)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "maskctc": jax.random.PRNGKey(1)},
        feats, ilens, ys, ylens,
    )

    def loss_fn(p):
        loss, stats = model.apply(
            {"params": p}, feats, ilens, ys, ylens,
            deterministic=False,
            rngs={"maskctc": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert "loss_mlm" in stats

    hyps = maskctc_recognize(model, variables, np.asarray(feats), np.asarray(ilens))
    assert len(hyps) == 2
    for h in hyps:
        assert all(0 < t < v - 1 for t in h)  # no masks or blanks remain


def test_enh_scoring_cli(tmp_path):
    from espnet_tpu.bin import enh_scoring
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    rng = np.random.RandomState(0)
    r1 = rng.randn(4000).astype(np.float32) * 0.3
    r2 = rng.randn(4000).astype(np.float32) * 0.3
    for name, wav in [("r1", r1), ("r2", r2),
                      ("e1", r2 + 0.01 * rng.randn(4000).astype(np.float32)),
                      ("e2", r1 + 0.01 * rng.randn(4000).astype(np.float32))]:
        write_wav(tmp_path / f"{name}.wav", 8000, wav)
    write_scp(tmp_path / "ref1.scp", {"u0": str(tmp_path / "r1.wav")})
    write_scp(tmp_path / "ref2.scp", {"u0": str(tmp_path / "r2.wav")})
    # estimates intentionally SWAPPED — PIT must still find high SI-SNR
    write_scp(tmp_path / "est1.scp", {"u0": str(tmp_path / "e1.wav")})
    write_scp(tmp_path / "est2.scp", {"u0": str(tmp_path / "e2.wav")})
    summary = enh_scoring.main([
        "--ref_scp", str(tmp_path / "ref1.scp"), str(tmp_path / "ref2.scp"),
        "--est_scp", str(tmp_path / "est1.scp"), str(tmp_path / "est2.scp"),
        "--output_dir", str(tmp_path / "score"),
        "--bss_eval", "--bss_eval_flen", "64",
    ])
    assert summary["si_snr"] > 20, summary
    # BSS Eval agrees: near-clean swapped estimates → high SDR/SIR/SAR
    assert summary["bss_sdr"] > 20 and summary["bss_sir"] > 20, summary
    assert summary["bss_sar"] > 20, summary


def test_enh_task_train(tmp_path):
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav
    from espnet_tpu.tasks import enh as enh_task

    rng = np.random.RandomState(0)
    mix_scp, r1_scp, r2_scp = {}, {}, {}
    for i in range(4):
        n = 3000
        t = np.arange(n) / 8000
        s1 = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        s2 = (rng.randn(n) * 0.2).astype(np.float32)
        for tag, wav, scp in [("s1", s1, r1_scp), ("s2", s2, r2_scp),
                              ("mix", s1 + s2, mix_scp)]:
            p = tmp_path / f"u{i}_{tag}.wav"
            write_wav(p, 8000, wav)
            scp[f"u{i}"] = str(p)
    write_scp(tmp_path / "mix.scp", mix_scp)
    write_scp(tmp_path / "ref1.scp", r1_scp)
    write_scp(tmp_path / "ref2.scp", r2_scp)
    data = [
        (str(tmp_path / "mix.scp"), "speech_mix", "sound"),
        (str(tmp_path / "ref1.scp"), "speech_ref1", "sound"),
        (str(tmp_path / "ref2.scp"), "speech_ref2", "sound"),
    ]
    config = {
        "separator": "tf_masking",
        "separator_conf": {"n_fft": 128, "hop_length": 64, "units": 16, "layers": 1},
        "n_spk": 2, "chunk_length": 1024, "batch_size": 4,
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "max_epoch": 3, "log_interval": 1000,
    }
    trainer = enh_task.train(config, data, data, str(tmp_path / "exp"))
    r = trainer.reporter
    assert r.get(3, "train", "loss") < r.get(1, "train", "loss")
    assert (tmp_path / "exp" / "valid.loss.best.ckpt").exists()


def test_st_conformer_encoder():
    """encoder: conformer in the ST task (e2e_st_conformer.py:19 parity)."""
    from espnet_tpu.tasks.st_mt import DEFAULT_CONFIG, build_st_model

    cfg = dict(DEFAULT_CONFIG)
    cfg["encoder"] = "conformer"
    cfg["encoder_conf"] = {
        "attention_dim": 16, "attention_heads": 2, "linear_units": 16,
        "num_blocks": 1, "input_layer": "linear", "cnn_kernel": 7,
    }
    cfg["decoder_conf"] = {
        "attention_dim": 16, "attention_heads": 2, "linear_units": 16,
        "num_blocks": 1,
    }
    cfg["frontend_conf"] = {"fs": 8000, "n_fft": 256, "hop_length": 128,
                            "n_mels": 8}
    m = build_st_model(cfg, vocab=11, src_vocab=9)
    assert m.encoder.__class__.__name__ == "ConformerEncoder"
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 3000).astype(np.float32))
    wl = jnp.array([3000, 2500])
    tgt = jnp.asarray(rng.randint(1, 10, (2, 5)).astype(np.int32))
    tl = jnp.array([5, 4])
    src = jnp.asarray(rng.randint(1, 8, (2, 4)).astype(np.int32))
    sl = jnp.array([4, 3])
    v = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav, wl, tgt, tl, src, sl,
    )
    loss, stats = m.apply(
        v, wav, wl, tgt, tl, src, sl,
        rngs={"dropout": jax.random.PRNGKey(2)}, deterministic=False,
    )
    assert np.isfinite(float(loss))
