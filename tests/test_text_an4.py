"""Tests: SPHERE reader, text cleaner, phoneme/g2p tokenizer,
tokenize_text CLI (reference analogs: test/espnet2/text/*,
test_utils/*.bats CLI tests)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from espnet_tpu.data.wav import read_audio, read_sph, write_wav
from espnet_tpu.text.cleaner import TextCleaner, number_to_words
from espnet_tpu.text.phoneme import PhonemeTokenizer, read_lexicon


def make_sph(path: Path, data: np.ndarray, rate: int = 16000):
    pcm = (np.clip(data, -1, 1) * 32767).astype("<i2").tobytes()
    header = (
        f"NIST_1A\n   1024\nsample_count -i {len(data)}\n"
        f"sample_rate -i {rate}\nsample_n_bytes -i 2\n"
        "channel_count -i 1\nsample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\nend_head\n"
    ).encode()
    path.write_bytes(header + b" " * (1024 - len(header)) + pcm)


def test_read_sph_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.randn(1600) * 0.1).astype(np.float32)
    f = tmp_path / "a.sph"
    make_sph(f, x)
    rate, y = read_sph(f)
    assert rate == 16000
    np.testing.assert_allclose(x, y, atol=2e-4)
    # read_audio dispatches on extension
    rate2, y2 = read_audio(f)
    np.testing.assert_array_equal(y, y2)
    w = tmp_path / "a.wav"
    write_wav(w, 16000, x)
    _, y3 = read_audio(w)
    np.testing.assert_allclose(x, y3, atol=2e-4)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand two hundred thirty four"


def test_tacotron_cleaner():
    c = TextCleaner(["tacotron"])
    out = c("Dr. Smith paid $15 on March 3rd, 1928!")
    assert out == (
        "DOCTOR SMITH PAID FIFTEEN DOLLARS ON MARCH THIRD, "
        "NINETEEN TWENTY EIGHT!"
    )
    assert c("café 0.5") == "CAFE ZERO POINT FIVE"


def test_phoneme_lexicon(tmp_path):
    lex = tmp_path / "dict"
    lex.write_text("HELLO  HH AH0 L OW1\nHELLO(2)  HH EH0 L OW1\nWORLD  W ER1 L D\n")
    assert read_lexicon(lex)["HELLO"] == ["HH", "AH", "L", "OW"]
    p = PhonemeTokenizer(f"lexicon:{lex}")
    assert p.text2tokens("hello world") == ["HH", "AH", "L", "OW", "W", "ER", "L", "D"]
    # OOV falls back to rules
    assert p.text2tokens("cat") == ["K", "AE", "T"]


def test_phoneme_rules():
    p = PhonemeTokenizer("en_rule")
    assert p.text2tokens("ship") == ["SH", "IH", "P"]
    assert p.text2tokens("knight") == ["N", "AY", "T"]
    assert p.text2tokens("cent")[0] == "S"  # soft c


def test_tokenize_text_cli(tmp_path):
    inp = tmp_path / "text"
    inp.write_text("utt1 AB BA\nutt2 AB\n")
    vocab = tmp_path / "tokens.txt"
    cmd = [
        sys.executable, "-m", "espnet_tpu.bin.tokenize_text",
        "-i", str(inp), "-o", str(vocab), "-f", "2-", "-t", "char",
        "--write_vocabulary", "true",
        "--add_symbol", "<blank>:0", "--add_symbol", "<unk>:1",
        "--add_symbol", "<sos/eos>:-1",
    ]
    subprocess.run(cmd, check=True, cwd="/root/repo")
    toks = vocab.read_text().splitlines()
    assert toks[0] == "<blank>" and toks[1] == "<unk>" and toks[-1] == "<sos/eos>"
    assert "A" in toks and "B" in toks and "<space>" in toks


def test_an4_data_prep(tmp_path):
    tarball = Path("/root/reference/egs/mini_an4/asr1/downloads.tar.gz")
    if not tarball.exists():
        pytest.skip("AN4 tarball unavailable")
    subprocess.run(
        [
            sys.executable,
            "/root/repo/recipes/mini_an4/local/data_prep.py",
            "--tarball", str(tarball), "--workdir", str(tmp_path),
        ],
        check=True,
    )
    for split, n in [("train_nodev", 3), ("train_dev", 2), ("test", 2)]:
        lines = (tmp_path / "data" / split / "wav.scp").read_text().splitlines()
        assert len(lines) == n
        # every wav is a readable SPHERE file
        _, wav = read_audio(lines[0].split(None, 1)[1])
        assert wav.ndim == 1 and len(wav) > 1000
