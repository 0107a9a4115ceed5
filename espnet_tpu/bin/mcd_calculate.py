"""CLI: mel-cepstral distortion between reference and synthesized wavs
(reference: utils/mcd_calculate.py).

Usage:
  python -m espnet_tpu.bin.mcd_calculate \
    --ref ref_wav.scp --hyp hyp_wav.scp [--fs 16000] [--out mcd.json]
Prints per-utterance and mean MCD (dB).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref", required=True, help="reference wav scp")
    parser.add_argument("--hyp", required=True, help="synthesized wav scp")
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--hop_length", type=int, default=256)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.data.wav import read_audio
    from espnet_tpu.utils.mcd import mcd

    refs = read_scp(args.ref)
    hyps = read_scp(args.hyp)
    per_utt = {}
    for uid in hyps:
        if uid not in refs:
            continue
        _, r = read_audio(refs[uid])
        _, h = read_audio(hyps[uid])
        if len(r) < args.n_fft or len(h) < args.n_fft:
            logging.warning(
                "%s: skipped (shorter than one analysis window: ref %d, "
                "hyp %d samples)", uid, len(r), len(h))
            continue
        per_utt[uid] = mcd(
            r, h, fs=args.fs, n_fft=args.n_fft, hop_length=args.hop_length
        )
        logging.info("%s: MCD %.3f dB", uid, per_utt[uid])
    mean = sum(per_utt.values()) / max(len(per_utt), 1)
    result = {"mean_mcd_db": mean, "num_utts": len(per_utt), "per_utt": per_utt}
    print(json.dumps({"mean_mcd_db": round(mean, 3), "num_utts": len(per_utt)}))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
