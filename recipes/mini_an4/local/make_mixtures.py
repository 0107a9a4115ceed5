"""2-speaker mixture generation from AN4 utterances (reference:
egs/mini_an4/asr_mix1 data prep — overlapped mixtures with per-speaker
transcripts)."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from espnet_tpu.data.kaldi_io import read_scp  # noqa: E402
from espnet_tpu.data.wav import read_audio, write_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="source data dir (wav.scp+text)")
    ap.add_argument("--out", required=True, help="output mixture data dir")
    ap.add_argument("--wav_out", required=True, help="dir for mixture wavs")
    ap.add_argument("--fs", type=int, default=16000)
    args = ap.parse_args()

    wavs = read_scp(Path(args.src) / "wav.scp")
    texts = read_scp(Path(args.src) / "text")
    uids = sorted(wavs)
    n = len(uids)
    assert n >= 2, "need at least two utterances to mix"

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    wav_out = Path(args.wav_out)
    wav_out.mkdir(parents=True, exist_ok=True)

    scp, s1, s2, t1, t2 = [], [], [], [], []
    for i in range(n):
        a, b = uids[i], uids[(i + 1) % n]
        if a == b:
            continue
        _, xa = read_audio(wavs[a])
        _, xb = read_audio(wavs[b])
        length = max(len(xa), len(xb))
        ra = np.zeros(length, np.float32)
        rb = np.zeros(length, np.float32)
        ra[: len(xa)] = xa
        rb[: len(xb)] = xb
        mix = ra + rb
        mix *= 0.7 / max(np.abs(mix).max(), 1e-6)
        mid = f"mix_{a}_{b}"
        path = wav_out / f"{mid}.wav"
        write_wav(path, args.fs, mix)
        # per-speaker padded references (SI-SNR targets for the joint
        # enh_asr task — SI-SNR is scale-invariant, so the mix gain does
        # not need to be applied to them)
        pa = wav_out / f"{mid}.spk1.wav"
        pb = wav_out / f"{mid}.spk2.wav"
        write_wav(pa, args.fs, ra)
        write_wav(pb, args.fs, rb)
        scp.append(f"{mid} {path.resolve()}")
        s1.append(f"{mid} {pa.resolve()}")
        s2.append(f"{mid} {pb.resolve()}")
        t1.append(f"{mid} {texts[a]}")
        t2.append(f"{mid} {texts[b]}")

    (out / "wav.scp").write_text("\n".join(scp) + "\n")
    (out / "spk1.scp").write_text("\n".join(s1) + "\n")
    (out / "spk2.scp").write_text("\n".join(s2) + "\n")
    (out / "text_spk1").write_text("\n".join(t1) + "\n")
    (out / "text_spk2").write_text("\n".join(t2) + "\n")
    # perm-free scoring reference: <uid>_spk<N> convention
    ref = [line.replace(" ", "_spk1 ", 1) for line in t1] + [
        line.replace(" ", "_spk2 ", 1) for line in t2
    ]
    (out / "text_ref").write_text("\n".join(sorted(ref)) + "\n")
    print(f"made {len(scp)} mixtures -> {out}")


if __name__ == "__main__":
    main()
