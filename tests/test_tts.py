"""TTS model tests: forward/backward finite, inference stops, losses
behave; Griffin-Lim reconstruction SNR; FastSpeech length regulator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.tts import FastSpeech2, Tacotron2, TransformerTTS
from espnet_tpu.models.tts.fastspeech import (
    durations_from_attention,
    length_regulate,
)

B, L, TDEC, MELS, V = 2, 7, 12, 10, 9


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(1, V - 1, size=(B, L)).astype(np.int32))
    tlens = jnp.array([L, L - 2])
    speech = jnp.asarray(rng.randn(B, TDEC, MELS).astype(np.float32))
    slens = jnp.array([TDEC, TDEC - 4])
    return text, tlens, speech, slens


@pytest.mark.slow
def test_tacotron2_forward_backward():
    text, tlens, speech, slens = _batch()
    model = Tacotron2(
        vocab_size=V, n_mels=MELS, embed_dim=16, enc_conv_layers=1,
        enc_conv_chans=16, enc_blstm_units=16, dunits=16, dlayers=2,
        prenet_units=8, postnet_chans=16, att_dim=8, aconv_chans=2,
        aconv_filts=3,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens,
    )

    def loss_fn(p):
        loss, stats = model.apply(
            {"params": p}, text, tlens, speech, slens,
            deterministic=True, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert {"l1_loss", "mse_loss", "bce_loss", "attn_loss"} <= set(stats)
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads)
    )


def test_tacotron2_inference_shapes():
    text, tlens, speech, slens = _batch()
    model = Tacotron2(
        vocab_size=V, n_mels=MELS, embed_dim=16, enc_conv_layers=1,
        enc_conv_chans=16, enc_blstm_units=16, dunits=16, dlayers=2,
        prenet_units=8, postnet_chans=16, att_dim=8, aconv_chans=2,
        aconv_filts=3,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens,
    )
    feats, olens, att = model.apply(
        variables, text, tlens, maxlenratio=3.0,
        method="inference", rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert feats.shape == (B, 3 * L, MELS)
    assert np.isfinite(np.asarray(feats)).all()
    assert att.shape[0] == B and att.shape[2] == L


@pytest.mark.slow
def test_transformer_tts_forward():
    text, tlens, speech, slens = _batch(1)
    model = TransformerTTS(
        vocab_size=V, n_mels=MELS, adim=16, aheads=2, elayers=1,
        eunits=16, dlayers=1, dunits=16, prenet_units=8, postnet_layers=2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens,
    )
    loss, stats = model.apply(
        variables, text, tlens, speech, slens,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))
    feats, olens = model.apply(
        variables, text, tlens, maxlenratio=2.0,
        method="inference", rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert feats.shape[0] == B and feats.shape[2] == MELS


def test_length_regulate():
    enc = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4) + 1)
    dur = jnp.array([[2, 0, 3]])
    out = length_regulate(enc, dur, 6)
    expect = np.stack(
        [enc[0, 0], enc[0, 0], enc[0, 2], enc[0, 2], enc[0, 2], np.zeros(4)]
    )
    np.testing.assert_allclose(np.asarray(out[0]), expect)


def test_durations_from_attention():
    att = np.zeros((1, 5, 3), dtype=np.float32)
    att[0, :2, 0] = 1
    att[0, 2:4, 1] = 1
    att[0, 4:, 2] = 1
    d = durations_from_attention(jnp.asarray(att), jnp.array([3]), jnp.array([5]))
    np.testing.assert_array_equal(np.asarray(d[0]), [2, 2, 1])


@pytest.mark.slow
def test_fastspeech2_forward_and_inference():
    text, tlens, speech, slens = _batch(2)
    rng = np.random.RandomState(3)
    dur = np.zeros((B, L), dtype=np.int32)
    for b in range(B):
        left = TDEC
        tl = int(tlens[b])
        for i in range(tl):
            d = max(1, TDEC // tl) if i < tl - 1 else left
            d = min(d, left)
            dur[b, i] = d
            left -= d
    pitch = jnp.asarray(rng.rand(B, L).astype(np.float32))
    energy = jnp.asarray(rng.rand(B, L).astype(np.float32))
    model = FastSpeech2(
        vocab_size=V, n_mels=MELS, adim=16, aheads=2, elayers=1,
        eunits=16, dlayers=1, dunits=16, postnet_layers=2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, jnp.asarray(dur), pitch, energy,
    )

    def loss_fn(p):
        return model.apply(
            {"params": p}, text, tlens, speech, slens, jnp.asarray(dur),
            pitch, energy, deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )

    (loss, stats), grads = jax.value_and_grad(
        lambda p: loss_fn(p), has_aux=True
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert {"duration_loss", "pitch_loss", "energy_loss", "l1_loss"} <= set(stats)

    feats, olens = model.apply(
        variables, text, tlens, max_out_len=30,
        method="inference", rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert feats.shape == (B, 30, MELS)
    assert np.isfinite(np.asarray(feats)).all()


def test_griffin_lim_roundtrip_snr():
    from espnet_tpu.ops.griffin_lim import griffin_lim, istft
    from espnet_tpu.ops.stft import stft

    fs = 8000
    t = np.arange(int(0.5 * fs)) / fs
    wav = (0.6 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    spec, _ = stft(jnp.asarray(wav), None, n_fft=256, hop_length=64)
    # istft inverse check
    rec = np.asarray(istft(spec, 256, 64))[0]
    n = min(len(rec), wav.shape[1])
    err = rec[200: n - 200] - wav[0, 200: n - 200]
    snr = 10 * np.log10(np.mean(wav[0, 200: n - 200] ** 2) / np.mean(err**2))
    assert snr > 30, snr
    # griffin-lim from magnitude recovers a tone-like signal
    mag = jnp.abs(spec)
    gl = np.asarray(griffin_lim(mag, 256, 64, n_iter=16))[0]
    spec2, _ = stft(jnp.asarray(gl[None]), None, 256, 64)
    np.testing.assert_allclose(
        np.abs(np.asarray(spec2))[0, 5:-5].mean(),
        np.asarray(mag)[0, 5:-5].mean(),
        rtol=0.2,
    )


def test_pitch_energy_extraction():
    from espnet_tpu.ops.pitch import average_by_duration, extract_energy, extract_f0

    fs = 8000
    t = np.arange(int(0.3 * fs)) / fs
    wav = 0.5 * np.sin(2 * np.pi * 200 * t).astype(np.float64)
    f0 = extract_f0(wav, fs=fs, frame_shift=80, frame_length=400, fmin=80, fmax=350)
    voiced = f0[f0 > 0]
    assert len(voiced) > 5
    np.testing.assert_allclose(np.median(voiced), 200, rtol=0.05)
    en = extract_energy(wav, frame_shift=80, frame_length=400)
    assert (en > 0.1).sum() > 5
    avg = average_by_duration(f0, np.array([len(f0) // 2, len(f0) - len(f0) // 2]))
    np.testing.assert_allclose(avg, [200, 200], rtol=0.1)


@pytest.mark.slow
def test_teacher_alignment_durations(tmp_path):
    """TTSTaskModel.teacher_alignment produces durations summing to the
    frame count — the tacotron2→fastspeech2 duration pipeline."""
    import jax
    from espnet_tpu.tasks.tts import build_tts_model

    config = {
        "tts": "tacotron2",
        "tts_conf": {
            "embed_dim": 8, "enc_conv_layers": 1, "enc_conv_chans": 8,
            "enc_blstm_units": 8, "dunits": 8, "dlayers": 1, "prenet_units": 4,
            "postnet_chans": 8, "att_dim": 4, "aconv_chans": 2, "aconv_filts": 2,
        },
        "feats_extract_conf": {"fs": 8000, "n_fft": 128, "hop_length": 64,
                               "n_mels": 10, "fmin": 0.0, "fmax": None},
    }
    model = build_tts_model(config, vocab=7)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 6, (2, 5)).astype(np.int32))
    tlens = jnp.array([5, 3])
    wav = jnp.asarray(rng.randn(2, 640).astype(np.float32))
    wlens = jnp.array([640, 512])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, wav, wlens,
    )
    dur, feat_lens = model.apply(
        variables, text, tlens, wav, wlens,
        method="teacher_alignment", rngs={"dropout": jax.random.PRNGKey(2)},
    )
    dur, feat_lens = np.asarray(dur), np.asarray(feat_lens)
    for b in range(2):
        assert dur[b].sum() == feat_lens[b], (dur[b], feat_lens[b])
        assert dur[b, int(tlens[b]):].sum() >= 0


@pytest.mark.slow
def test_wavenet_train_and_generate():
    from espnet_tpu.models.tts.wavenet import WaveNet, mulaw_decode, mulaw_encode

    # mu-law roundtrip
    x = jnp.asarray(np.linspace(-0.9, 0.9, 64, dtype=np.float32))
    enc = mulaw_encode(x)
    dec = mulaw_decode(enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(x), atol=0.02)

    rng = np.random.RandomState(0)
    model = WaveNet(
        quantize=64, layers=4, stacks=2, residual_channels=8,
        gate_channels=8, skip_channels=8, aux_channels=5, upsample_factor=16,
    )
    audio = jnp.asarray(rng.randn(2, 128).astype(np.float32) * 0.2)
    feats = jnp.asarray(rng.randn(2, 8, 5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, feats)
    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, audio, feats), has_aux=True
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))

    wav = model.apply(variables, feats[:1], 40, method="generate")
    assert wav.shape == (40,)
    assert np.isfinite(np.asarray(wav)).all()


def test_zoneout_and_cbhg():
    from espnet_tpu.layers.tacotron_extras import CBHG, ZoneOutLSTMCell

    rng = np.random.RandomState(1)
    cell = ZoneOutLSTMCell(8, zoneout_rate=0.3)
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    carry = (jnp.zeros((2, 8)), jnp.zeros((2, 8)))
    variables = cell.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        carry, x,
    )
    (c, h), y = cell.apply(variables, carry, x)  # deterministic
    assert np.isfinite(np.asarray(h)).all()
    (c2, h2), _ = cell.apply(
        variables, carry, x, False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(np.asarray(h2)).all()

    cbhg = CBHG(out_dim=17, conv_bank_k=4, conv_bank_chans=8, proj_chans=8,
                highway_layers=2, gru_units=8)
    mel = jnp.asarray(rng.randn(2, 12, 10).astype(np.float32))
    variables = cbhg.init(jax.random.PRNGKey(0), mel, jnp.array([12, 9]))
    out = cbhg.apply(variables, mel, jnp.array([12, 9]))
    assert out.shape == (2, 12, 17)
    assert np.isfinite(np.asarray(out)).all()


def test_tacotron2_speaker_embedding():
    text, tlens, speech, slens = _batch(4)
    model = Tacotron2(
        vocab_size=V, n_mels=MELS, embed_dim=16, enc_conv_layers=1,
        enc_conv_chans=16, enc_blstm_units=16, dunits=16, dlayers=1,
        prenet_units=8, postnet_chans=16, att_dim=8, aconv_chans=2,
        aconv_filts=3, spk_embed_dim=12,
    )
    spembs = jnp.asarray(np.random.RandomState(5).randn(B, 12).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, spembs,
    )
    loss, stats = model.apply(
        variables, text, tlens, speech, slens, spembs,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_tacotron2_cbhg_linear_output():
    text, tlens, speech, slens = _batch(6)
    spc = jnp.asarray(np.random.RandomState(7).randn(B, TDEC, 17).astype(np.float32))
    model = Tacotron2(
        vocab_size=V, n_mels=MELS, embed_dim=16, enc_conv_layers=1,
        enc_conv_chans=16, enc_blstm_units=16, dunits=16, dlayers=1,
        prenet_units=8, postnet_chans=16, att_dim=8, aconv_chans=2,
        aconv_filts=3, use_cbhg=True, spc_dim=17,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, None, spc,
    )
    loss, stats = model.apply(
        variables, text, tlens, speech, slens, None, spc,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert "cbhg_loss" in stats and np.isfinite(float(loss))
