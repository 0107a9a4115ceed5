"""Generate the mini_synth corpus: tone-coded letter 'speech'
(the bundled-corpus analog of the reference's egs/mini_an4 downloads)."""
import argparse
from pathlib import Path

import numpy as np

import sys

FS = 8000
LETTERS = ["A", "B", "C", "D", "E"]


def synth(text, rng):
    segs = []
    for ch in text.split():
        f = 350 + 220 * LETTERS.index(ch)
        t = np.arange(int(0.12 * FS)) / FS
        segs.append(0.5 * np.sin(2 * np.pi * f * t))
    wav = np.concatenate(segs)
    return (wav + rng.randn(len(wav)) * 0.02).astype(np.float32)


def main():
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=60)
    p.add_argument("--n_dev", type=int, default=10)
    p.add_argument("--n_test", type=int, default=10)
    args = p.parse_args()
    out = Path(args.out)
    for split, n, seed in [
        ("train", args.n_train, 0),
        ("dev", args.n_dev, 1),
        ("test", args.n_test, 2),
    ]:
        rng = np.random.RandomState(seed)
        d = out / split
        (d / "wav").mkdir(parents=True, exist_ok=True)
        wav_scp, text_scp = {}, {}
        for i in range(n):
            k = rng.randint(2, 6)
            text = " ".join(rng.choice(LETTERS) for _ in range(k))
            uid = f"{split}_{i:03d}"
            write_wav(d / "wav" / f"{uid}.wav", FS, synth(text, rng))
            wav_scp[uid] = str(d / "wav" / f"{uid}.wav")
            text_scp[uid] = text
        write_scp(d / "wav.scp", wav_scp)
        write_scp(d / "text", text_scp)
    # token list from train text
    from espnet_tpu.text.tokenizers import build_token_list

    texts = [
        line.split(" ", 1)[1]
        for line in (out / "train" / "text").read_text().splitlines()
    ]
    (out / "tokens.txt").write_text("\n".join(build_token_list(texts, "char")))
    print(f"mini_synth data ready at {out}")


if __name__ == "__main__":
    main()
