"""CLI: score hypothesis text against reference text (reference:
utils/score_sclite.sh → sctk sclite).

Emits sclite-style word/char alignment reports + summary.json with
corpus WER/CER — the end-artifact every decode stage feeds.

Usage:
  python -m espnet_tpu.bin.score_text \
    --ref data/test/text --hyp exp/decode/text --output_dir exp/decode
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref", required=True, help="reference text scp")
    parser.add_argument("--hyp", required=True, help="hypothesis text scp")
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.utils.metrics import edit_distance, sclite_report

    refs = read_scp(args.ref)
    hyps = read_scp(args.hyp)
    common = [k for k in hyps if k in refs]
    word_pairs = {k: (refs[k].split(), hyps[k].split()) for k in common}
    char_pairs = {
        k: (list(refs[k].replace(" ", "")), list(hyps[k].replace(" ", "")))
        for k in common
    }
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "result.wrd.txt").write_text(sclite_report(word_pairs))
    (out / "result.txt").write_text(sclite_report(char_pairs))
    n_w = sum(len(r) for r, _ in word_pairs.values())
    n_c = sum(len(r) for r, _ in char_pairs.values())
    wer = sum(edit_distance(r, h) for r, h in word_pairs.values()) / max(n_w, 1)
    cer = sum(edit_distance(r, h) for r, h in char_pairs.values()) / max(n_c, 1)
    summary = {"wer": wer, "cer": cer, "num_utts": len(common)}
    (out / "summary.json").write_text(json.dumps(summary))
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
