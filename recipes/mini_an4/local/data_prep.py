"""AN4 data preparation (reference: egs/mini_an4/asr1/local/data_prep.py +
run.sh stage 0-1 split logic).

Untars the offline AN4 corpus (NIST SPHERE wavs + transcriptions), builds
Kaldi-style data dirs {wav.scp, text, utt2spk}, and makes the reference
split: dev = first 2 train utterances, train_nodev = the rest
(egs/mini_an4/asr1/run.sh:115-117 subset_data_dir --first/--last).

Our wav.scp points directly at .sph files — espnet_tpu.data.wav.read_sph
replaces the reference's sph2pipe C tool.
"""
from __future__ import annotations

import argparse
import re
import tarfile
from pathlib import Path

TRANS_RE = re.compile(r"^(?:<s>)?\s*(.*?)\s*(?:</s>)?\s*\(([^)]+)\)\s*$")


def parse_transcription(path: Path):
    """an4_*.transcription lines: '<s> TEXT </s> (fileid)' → [(fileid, text)]."""
    out = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        m = TRANS_RE.match(line.replace("<s>", "").replace("</s>", ""))
        if not m:
            raise ValueError(f"bad transcription line: {line}")
        text, fid = m.group(1).strip(), m.group(2)
        out.append((fid, " ".join(text.split())))
    return out


def write_dir(datadir: Path, entries):
    """entries: [(uttid, spk, wavpath, text)]."""
    datadir.mkdir(parents=True, exist_ok=True)
    entries = sorted(entries)
    with open(datadir / "wav.scp", "w") as w, open(datadir / "text", "w") as t, open(
        datadir / "utt2spk", "w"
    ) as u:
        for utt, spk, wav, text in entries:
            w.write(f"{utt} {wav}\n")
            t.write(f"{utt} {text}\n")
            u.write(f"{utt} {spk}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--tarball",
        default="/root/reference/egs/mini_an4/asr1/downloads.tar.gz",
        help="offline AN4 corpus tarball",
    )
    ap.add_argument("--workdir", default=".", help="recipe dir (downloads/ + data/)")
    ap.add_argument("--ndev", type=int, default=2, help="first N train utts -> dev")
    args = ap.parse_args()

    work = Path(args.workdir)
    an4_root = work / "downloads" / "an4"
    if not (an4_root / "README").exists():
        with tarfile.open(args.tarball) as tf:
            tf.extractall(work)
    assert (an4_root / "README").exists(), f"an4 root missing at {an4_root}"

    for split, name in [("train", "train"), ("test", "test")]:
        trans = parse_transcription(an4_root / "etc" / f"an4_{split}.transcription")
        fileids = (an4_root / "etc" / f"an4_{split}.fileids").read_text().split()
        fid2path = {Path(f).name: an4_root / "wav" / f"{f}.sph" for f in fileids}
        entries = []
        for fid, text in trans:
            wav = fid2path[fid]
            assert wav.exists(), wav
            spk = fid.split("-")[1]
            entries.append((f"{spk}-{fid}", spk, str(wav.resolve()), text))
        write_dir(work / "data" / name, entries)

    # reference split: dev = first ndev of sorted train, train_nodev = rest
    train_lines = {
        f: (work / "data" / "train" / f).read_text().splitlines()
        for f in ("wav.scp", "text", "utt2spk")
    }
    n = args.ndev
    for sub, sl in [("train_dev", slice(0, n)), ("train_nodev", slice(n, None))]:
        d = work / "data" / sub
        d.mkdir(parents=True, exist_ok=True)
        for f, lines in train_lines.items():
            (d / f).write_text("\n".join(lines[sl]) + "\n")

    print(
        "prepared:",
        {
            s: len((work / "data" / s / "text").read_text().splitlines())
            for s in ("train_nodev", "train_dev", "test")
        },
    )


if __name__ == "__main__":
    main()
