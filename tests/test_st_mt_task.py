"""ST/MT task training smoke + BLEU metric."""
import pytest
import numpy as np

from espnet_tpu.utils.metrics import bleu


def test_bleu_metric():
    refs = [list("the cat sat".split())]
    assert bleu(refs, refs) == 1.0
    assert bleu(refs, [["the", "dog"]]) < 0.5
    assert bleu([["a"]], [[]]) == 0.0


@pytest.mark.slow
def test_mt_task_train(tmp_path):
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.tasks import st_mt

    rng = np.random.RandomState(0)
    src, tgt = {}, {}
    # toy "translation": reverse the letter sequence
    for i in range(24):
        k = rng.randint(2, 5)
        letters = [rng.choice(list("abc")) for _ in range(k)]
        uid = f"u{i:02d}"
        src[uid] = " ".join(letters)
        tgt[uid] = " ".join(reversed(letters))
    write_scp(tmp_path / "src", src)
    write_scp(tmp_path / "tgt", tgt)
    tokens = ["<blank>", "<unk>", "<space>", "a", "b", "c", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens))
    config = {
        "token_list": str(tmp_path / "tokens.txt"),
        "encoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1},
        "decoder_conf": {"attention_dim": 16, "attention_heads": 2,
                         "linear_units": 16, "num_blocks": 1},
        "optim": "adam", "optim_conf": {"lr": 3e-3},
        "max_epoch": 3, "batch_size": 8, "token_type": "char",
        "log_interval": 1000,
    }
    data = [
        (str(tmp_path / "src"), "src_text", "text"),
        (str(tmp_path / "tgt"), "text", "text"),
    ]
    trainer = st_mt.train(config, data, data, str(tmp_path / "exp"), task="mt")
    r = trainer.reporter
    assert r.get(3, "train", "loss") < r.get(1, "train", "loss")
    assert r.get(3, "train", "acc") is not None
