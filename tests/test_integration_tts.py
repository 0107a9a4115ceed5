"""TTS end-to-end integration: synthetic corpus → collect-stats →
train tiny Tacotron2 via task API → Text2Speech synthesis to waveform
(analog of reference egs/mini_an4/tts1 CI run)."""
import pytest
from pathlib import Path

import numpy as np

from espnet_tpu.data.kaldi_io import write_scp
from espnet_tpu.data.wav import write_wav

pytestmark = pytest.mark.slow  # integration-scale trainings

FS = 8000
LETTERS = ["A", "B", "C"]
FREQS = {l: 300 + 250 * i for i, l in enumerate(LETTERS)}


def make_tts_corpus(root: Path, n: int, seed: int):
    rng = np.random.RandomState(seed)
    wav_scp, text_scp = {}, {}
    (root / "wav").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        k = rng.randint(2, 4)
        text = " ".join(rng.choice(LETTERS) for _ in range(k))
        segs = []
        for ch in text.split():
            t = np.arange(int(0.15 * FS)) / FS
            segs.append(0.4 * np.sin(2 * np.pi * FREQS[ch] * t))
        wav = np.concatenate(segs).astype(np.float32)
        uid = f"utt{i:03d}"
        write_wav(root / "wav" / f"{uid}.wav", FS, wav)
        wav_scp[uid] = str(root / "wav" / f"{uid}.wav")
        text_scp[uid] = text
    write_scp(root / "wav.scp", wav_scp)
    write_scp(root / "text", text_scp)


def test_tts_pipeline(tmp_path):
    train_dir = tmp_path / "train"
    make_tts_corpus(train_dir, 12, seed=0)
    from espnet_tpu.text.tokenizers import build_token_list

    texts = [t.split(" ", 1)[1] for t in (train_dir / "text").read_text().splitlines()]
    token_list = build_token_list(texts, "char")
    tokens_file = tmp_path / "tokens.txt"
    tokens_file.write_text("\n".join(token_list))

    config = {
        "token_list": str(tokens_file),
        "tts": "tacotron2",
        "tts_conf": {
            "embed_dim": 16, "enc_conv_layers": 1, "enc_conv_chans": 16,
            "enc_blstm_units": 16, "dunits": 16, "dlayers": 1,
            "prenet_units": 8, "postnet_chans": 16, "att_dim": 8,
            "aconv_chans": 2, "aconv_filts": 3,
        },
        "feats_extract_conf": {
            "fs": FS, "n_fft": 256, "hop_length": 128, "n_mels": 20,
            "fmin": 0.0, "fmax": None,
        },
        "optim": "adam",
        "optim_conf": {"lr": 1e-3},
        "max_epoch": 2,
        "batch_size": 6,
        "token_type": "char",
        "log_interval": 1000,
    }
    data = [
        (str(train_dir / "wav.scp"), "speech", "sound"),
        (str(train_dir / "text"), "text", "text"),
    ]
    from espnet_tpu.tasks import tts as tts_task

    stats_dir = tmp_path / "stats"
    token_list_l = token_list
    tts_task.collect_stats(config, data, str(stats_dir), token_list_l)
    assert (stats_dir / "feats_stats.npz").exists()

    expdir = tmp_path / "exp"
    trainer = tts_task.train(config, data, data, str(expdir), str(stats_dir))
    assert trainer.reporter.get(2, "train", "loss") is not None
    assert (expdir / "valid.loss.best.ckpt").exists()

    # synthesis CLI
    from espnet_tpu.bin import tts_inference

    out = tmp_path / "synth"
    test_text = tmp_path / "synth_text"
    test_text.write_text("s1 A B\n")
    tts_inference.main(
        [
            "--text", str(test_text),
            "--config", str(expdir / "config.yaml"),
            "--ckpt", str(expdir / "valid.loss.best.ckpt"),
            "--output_dir", str(out),
        ]
    )
    wavs = list((out / "wav").glob("*.wav"))
    assert len(wavs) == 1
    from espnet_tpu.data.wav import read_wav

    rate, w = read_wav(wavs[0])
    assert rate == FS and len(w) > 0 and np.isfinite(w).all()


def test_fastspeech2_pipeline(tmp_path):
    """Teacher tacotron2 → aux extraction CLI → FastSpeech2 training →
    non-autoregressive synthesis (the two-stage reference workflow)."""
    import numpy as np

    train_dir = tmp_path / "train"
    make_tts_corpus(train_dir, 8, seed=3)
    from espnet_tpu.text.tokenizers import build_token_list

    texts = [t.split(" ", 1)[1] for t in (train_dir / "text").read_text().splitlines()]
    token_list = build_token_list(texts, "char")
    tokens_file = tmp_path / "tokens.txt"
    tokens_file.write_text("\n".join(token_list))

    base_feats = {
        "fs": FS, "n_fft": 256, "hop_length": 128, "n_mels": 20,
        "fmin": 0.0, "fmax": None,
    }
    teacher_config = {
        "token_list": str(tokens_file),
        "tts": "tacotron2",
        "tts_conf": {
            "embed_dim": 8, "enc_conv_layers": 1, "enc_conv_chans": 8,
            "enc_blstm_units": 8, "dunits": 8, "dlayers": 1, "prenet_units": 4,
            "postnet_chans": 8, "att_dim": 4, "aconv_chans": 2, "aconv_filts": 2,
        },
        "feats_extract_conf": base_feats,
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "max_epoch": 1, "batch_size": 4, "token_type": "char",
        "log_interval": 1000,
    }
    data = [
        (str(train_dir / "wav.scp"), "speech", "sound"),
        (str(train_dir / "text"), "text", "text"),
    ]
    from espnet_tpu.tasks import tts as tts_task

    stats_dir = tmp_path / "stats"
    tts_task.collect_stats(teacher_config, data, str(stats_dir), token_list)
    teacher_dir = tmp_path / "teacher"
    tts_task.train(teacher_config, data, data, str(teacher_dir), str(stats_dir))

    # aux extraction CLI
    from espnet_tpu.bin import tts_extract_aux

    aux_dir = tmp_path / "aux"
    tts_extract_aux.main(
        [
            "--data", f"{train_dir}/wav.scp,speech,sound",
            "--data", f"{train_dir}/text,text,text",
            "--teacher_config", str(teacher_dir / "config.yaml"),
            "--teacher_ckpt", str(teacher_dir / "valid.loss.best.ckpt"),
            "--output_dir", str(aux_dir),
        ]
    )
    assert (aux_dir / "durations").exists()
    assert (aux_dir / "pitch.scp").exists()

    # FastSpeech2 training with the aux targets
    fs2_config = dict(teacher_config)
    fs2_config.update(
        tts="fastspeech2",
        tts_conf={"adim": 8, "aheads": 2, "elayers": 1, "eunits": 8,
                  "dlayers": 1, "dunits": 8, "postnet_layers": 2},
        max_epoch=1,
    )
    fs2_data = data + [
        (str(aux_dir / "durations"), "durations", "text_int"),
        (str(aux_dir / "pitch.scp"), "pitch", "npy"),
        (str(aux_dir / "energy.scp"), "energy", "npy"),
    ]
    fs2_dir = tmp_path / "fs2"
    trainer = tts_task.train(fs2_config, fs2_data, fs2_data, str(fs2_dir), str(stats_dir))
    assert trainer.reporter.get(1, "train", "duration_loss") is not None

    # non-AR synthesis
    model, variables, tl = tts_task.build_model_from_file(
        fs2_dir / "config.yaml", fs2_dir / "valid.loss.best.ckpt"
    )
    import jax
    import jax.numpy as jnp

    text = jnp.asarray(np.array([[3, 2, 4]], dtype=np.int32))
    feats, olens = model.apply(
        variables, text, jnp.array([3]), method="synthesize",
        rngs={"dropout": jax.random.PRNGKey(0)}, max_out_len=50,
    )
    assert feats.shape[1] == 50 and np.isfinite(np.asarray(feats)).all()
