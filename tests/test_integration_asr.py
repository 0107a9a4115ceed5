"""End-to-end recipe integration test (analog of reference
ci/test_integration.sh on egs/mini_an4): synthetic tone-coded corpus →
token list → collect-stats → train (task API) → beam decode (CLI) → WER.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from espnet_tpu.data.kaldi_io import write_scp
from espnet_tpu.data.wav import write_wav

pytestmark = pytest.mark.slow  # integration-scale trainings

FS = 8000
LETTERS = ["A", "B", "C", "D"]
FREQS = {l: 400 + 300 * i for i, l in enumerate(LETTERS)}


def synth_utt(text: str, rng) -> np.ndarray:
    segs = []
    for ch in text.split():
        f = FREQS[ch]
        t = np.arange(int(0.12 * FS)) / FS
        segs.append(0.5 * np.sin(2 * np.pi * f * t))
    wav = np.concatenate(segs) if segs else np.zeros(100)
    wav += rng.randn(len(wav)) * 0.02
    return wav.astype(np.float32)


def make_corpus(root: Path, n_utts: int, seed: int):
    rng = np.random.RandomState(seed)
    wav_scp, text_scp = {}, {}
    (root / "wav").mkdir(parents=True, exist_ok=True)
    for i in range(n_utts):
        n_words = rng.randint(2, 5)
        text = " ".join(rng.choice(LETTERS) for _ in range(n_words))
        uid = f"utt{i:03d}"
        path = root / "wav" / f"{uid}.wav"
        write_wav(path, FS, synth_utt(text, rng))
        wav_scp[uid] = str(path)
        text_scp[uid] = text
    write_scp(root / "wav.scp", wav_scp)
    write_scp(root / "text", text_scp)
    return wav_scp, text_scp



def test_full_asr_pipeline(tmp_path):
    train_dir = tmp_path / "train"
    valid_dir = tmp_path / "valid"
    make_corpus(train_dir, 48, seed=0)
    make_corpus(valid_dir, 6, seed=1)

    # token list (char-level over words A-D + space)
    from espnet_tpu.text.tokenizers import build_token_list

    texts = [v for v in (train_dir / "text").read_text().splitlines()]
    texts = [t.split(" ", 1)[1] for t in texts]
    token_list = build_token_list(texts, "char")
    tokens_file = tmp_path / "tokens.txt"
    tokens_file.write_text("\n".join(token_list))

    config = {
        "token_list": str(tokens_file),
        "frontend": "default",
        "frontend_conf": {"fs": FS, "n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "global_mvn",
        "encoder": "rnn",
        "encoder_conf": {"elayers": 1, "eunits": 32, "eprojs": 32},
        "decoder": "rnn",
        "decoder_conf": {
            "dunits": 32, "dlayers": 1, "att_dim": 32,
            "aconv_chans": 4, "aconv_filts": 5,
        },
        "model_conf": {"ctc_weight": 0.5},
        "optim": "adam",
        "optim_conf": {"lr": 5e-3},
        "max_epoch": 20,
        "batch_size": 8,
        "log_interval": 1000,
        "token_type": "char",
        "keep_nbest": 3,
    }
    train_data = [
        (str(train_dir / "wav.scp"), "speech", "sound"),
        (str(train_dir / "text"), "text", "text"),
    ]
    valid_data = [
        (str(valid_dir / "wav.scp"), "speech", "sound"),
        (str(valid_dir / "text"), "text", "text"),
    ]

    from espnet_tpu.tasks import asr as asr_task

    stats_dir = tmp_path / "stats"
    asr_task.collect_stats(config, train_data, str(stats_dir), token_list)
    assert (stats_dir / "feats_stats.npz").exists()
    assert (stats_dir / "speech_shape").exists()

    expdir = tmp_path / "exp"
    trainer = asr_task.train(
        config, train_data, valid_data, str(expdir), str(stats_dir)
    )
    r = trainer.reporter
    assert r.get(config["max_epoch"], "train", "loss") < r.get(1, "train", "loss")
    assert (expdir / "config.yaml").exists()
    assert (expdir / "valid.loss.best.ckpt").exists()

    # decode via CLI
    from espnet_tpu.bin import asr_recog

    out_dir = tmp_path / "decode"
    summary = asr_recog.main(
        [
            "--data", f"{valid_dir}/wav.scp,speech,sound",
            "--text", str(valid_dir / "text"),
            "--config", str(expdir / "config.yaml"),
            "--ckpt", str(expdir / "valid.loss.best.ckpt"),
            "--output_dir", str(out_dir),
            "--beam_size", "5",
            "--ctc_weight", "0.5",
            "--batch_size", "3",
        ]
    )
    assert (out_dir / "text").exists()
    assert (out_dir / "result.wrd.txt").exists()
    assert summary["num_utts"] == 6
    # trained model must do far better than chance
    assert summary["wer"] < 0.5, summary


def test_long_audio_ctc_segmentation(tmp_path):
    """Train a small CTC model, concatenate utterances into one long
    recording with silence gaps, and recover their positions via
    asr_align --utt2audio (reference espnet/bin/asr_align.py:228)."""
    train_dir = tmp_path / "train"
    make_corpus(train_dir, 48, seed=3)
    from espnet_tpu.text.tokenizers import build_token_list

    texts = [
        t.split(" ", 1)[1]
        for t in (train_dir / "text").read_text().splitlines()
    ]
    tokens_file = tmp_path / "tokens.txt"
    tokens_file.write_text("\n".join(build_token_list(texts, "char")))
    config = {
        "token_list": str(tokens_file),
        "frontend": "default",
        "frontend_conf": {"fs": FS, "n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "global_mvn",
        "encoder": "rnn",
        "encoder_conf": {"elayers": 1, "eunits": 32, "eprojs": 32},
        "model_conf": {"ctc_weight": 1.0},  # pure CTC
        "optim": "adam",
        "optim_conf": {"lr": 5e-3},
        "max_epoch": 15,
        "batch_size": 8,
        "log_interval": 1000,
        "token_type": "char",
    }
    train_data = [
        (str(train_dir / "wav.scp"), "speech", "sound"),
        (str(train_dir / "text"), "text", "text"),
    ]
    from espnet_tpu.tasks import asr as asr_task

    stats_dir = tmp_path / "stats"
    asr_task.collect_stats(config, train_data, str(stats_dir), build_token_list(texts, "char"))
    expdir = tmp_path / "exp"
    asr_task.train(config, train_data, train_data, str(expdir), str(stats_dir))

    # one long recording: silence + 3 train utterances + silence gaps
    from espnet_tpu.data.wav import read_wav
    from espnet_tpu.data.kaldi_io import read_scp, write_scp

    wav_scp = read_scp(train_dir / "wav.scp")
    text_scp = read_scp(train_dir / "text")
    picks = sorted(wav_scp)[:3]
    gap = np.zeros(int(0.4 * FS), np.float32)
    pieces, truth, t = [gap], {}, len(gap) / FS
    for uid in picks:
        _, w = read_wav(wav_scp[uid])
        pieces += [w, gap]
        truth[uid] = (t, t + len(w) / FS)
        t += (len(w) + len(gap)) / FS
    long_dir = tmp_path / "long"
    (long_dir).mkdir()
    write_wav(long_dir / "rec1.wav", FS, np.concatenate(pieces))
    write_scp(long_dir / "wav.scp", {"rec1": str(long_dir / "rec1.wav")})
    write_scp(long_dir / "text", {u: text_scp[u] for u in picks})
    write_scp(long_dir / "utt2audio", {u: "rec1" for u in picks})

    from espnet_tpu.bin import asr_align

    seg_file = tmp_path / "segments"
    asr_align.main([
        "--data", f"{long_dir}/wav.scp,speech,sound",
        "--text", str(long_dir / "text"),
        "--utt2audio", str(long_dir / "utt2audio"),
        "--config", str(expdir / "config.yaml"),
        "--ckpt", str(expdir / "valid.loss.best.ckpt"),
        "--output", str(seg_file),
    ])
    lines = seg_file.read_text().strip().splitlines()
    assert len(lines) == 3
    for line in lines:
        uid, aid, t0, t1, conf = line.split()
        t0, t1 = float(t0), float(t1)
        ts, te = truth[uid]
        assert aid == "rec1"
        # recovered window within 0.25 s of the true span
        assert abs(t0 - ts) < 0.25 and abs(t1 - te) < 0.25, (uid, t0, t1, ts, te)
        assert float(conf) > -5.0
