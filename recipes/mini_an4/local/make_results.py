"""Generate RESULTS.md from decode summaries (reference convention:
egs2/TEMPLATE/asr1/scripts/utils/show_asr_result.sh → RESULTS.md)."""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--expdir", default="exp")
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()

    exp = Path(args.expdir)
    lines = [
        "# RESULTS — mini_an4 (real AN4 speech, offline corpus from the reference)",
        "",
        "Hybrid CTC/attention BLSTMP (conf/train_rnn.yaml), char tokens,",
        "beam 10 + RNNLM fusion 0.3. Corpus: the reference's CI-scale AN4",
        "subset (egs/mini_an4/asr1/downloads.tar.gz) — 3 train / 2 dev /",
        "2 test utterances of real microphone speech (NIST SPHERE, 16 kHz).",
        "",
        "Interpretation: train_nodev WER shows the full pipeline (SPHERE",
        "read → STFT/fbank → BLSTMP+location-attention+CTC → beam decode",
        "with LM fusion) transcribing real speech it was trained on; with",
        "only 3 training utterances the held-out sets cannot be matched —",
        "the reference's own CI run of this corpus has the same property",
        "(it asserts pipeline completion, not accuracy).",
        "",
        "| set | WER | CER | #utts |",
        "|---|---|---|---|",
    ]
    for d in sorted(exp.glob("asr/decode_*")):
        s = json.loads((d / "summary.json").read_text())
        lines.append(
            f"| {d.name.replace('decode_', '')} "
            f"| {s['wer'] * 100:.1f}% | {s['cer'] * 100:.1f}% | {s['num_utts']} |"
        )
    lines.append("")
    # sclite-style word alignment report for transparency
    for d in sorted(exp.glob("asr/decode_*")):
        rep = d / "result.wrd.txt"
        if rep.exists():
            lines.append(f"## {d.name} (word-level sclite report)")
            lines.append("```")
            lines.extend(rep.read_text().splitlines())
            lines.append("```")
            lines.append("")
    Path(args.out).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
