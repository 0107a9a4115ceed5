"""Transducer end-to-end via task + CLI: train with model_type=transducer
on the synthetic tone corpus, decode greedily through asr_recog."""
import pytest
import numpy as np

pytestmark = pytest.mark.slow  # integration-scale trainings


def test_transducer_task_pipeline(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_integration_asr import FS, make_corpus

    from espnet_tpu.tasks import asr as asr_task
    from espnet_tpu.text.tokenizers import build_token_list

    train_dir = tmp_path / "train"
    make_corpus(train_dir, 32, seed=0)
    texts = [t.split(" ", 1)[1] for t in (train_dir / "text").read_text().splitlines()]
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
        "model_type": "transducer",
        "model_conf": {"dunits": 32, "joint_dim": 32},
        "optim": "adam",
        "optim_conf": {"lr": 5e-3},
        "max_epoch": 12,
        "batch_size": 8,
        "log_interval": 1000,
        "token_type": "char",
    }
    data = [
        (str(train_dir / "wav.scp"), "speech", "sound"),
        (str(train_dir / "text"), "text", "text"),
    ]
    stats_dir = tmp_path / "stats"
    asr_task.collect_stats(config, data, str(stats_dir), token_list)
    trainer = asr_task.train(config, data, data, str(tmp_path / "exp"), str(stats_dir))
    r = trainer.reporter
    assert r.get(12, "train", "loss") < r.get(1, "train", "loss")

    from espnet_tpu.bin import asr_recog

    summary = asr_recog.main(
        [
            "--data", f"{train_dir}/wav.scp,speech,sound",
            "--text", str(train_dir / "text"),
            "--config", str(tmp_path / "exp/config.yaml"),
            "--ckpt", str(tmp_path / "exp/valid.loss.best.ckpt"),
            "--output_dir", str(tmp_path / "decode"),
            "--batch_size", "8",
            "--transducer_search", "greedy",
        ]
    )
    # decoding the training set of an overfit-capable model: well under chance
    assert summary["wer"] < 0.7, summary
