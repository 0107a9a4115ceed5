"""Kaldi-style data-directory utilities: validate / fix / subset.

Reference analogs (driven from every egs recipe):
  utils/validate_data_dir.sh — key consistency/sortedness checks
  utils/fix_data_dir.sh      — intersect keys across files, resort
  utils/subset_data_dir.sh   — --first/--last/--utt-list/--spk subsets

A "data dir" here is a directory holding line-per-utterance scp-format
files keyed by utterance id: wav.scp (or feats.scp), text, and
optionally utt2spk / segments / any other per-utt file. All operations
work on whichever of the known files exist.

Usage:
  python -m espnet_tpu.bin.data_utils validate <dir>
  python -m espnet_tpu.bin.data_utils fix <dir>
  python -m espnet_tpu.bin.data_utils subset <src> <dst> \
      (--first N | --last N | --utt_list FILE | --spk SPK [SPK...])
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict, List

# per-utterance files we manage (first column = utt id)
UTT_FILES = ["wav.scp", "feats.scp", "text", "utt2spk", "segments", "utt2dur"]


def _read(path: Path) -> Dict[str, str]:
    d: Dict[str, str] = {}
    for ln, line in enumerate(path.read_text().splitlines(), 1):
        if not line.strip():
            continue
        parts = line.split(None, 1)
        k = parts[0]
        v = parts[1] if len(parts) > 1 else ""
        if k in d:
            raise SystemExit(f"{path}:{ln}: duplicate key {k!r}")
        d[k] = v
    return d


def _present(d: Path) -> List[str]:
    return [f for f in UTT_FILES if (d / f).exists()]


def validate(data_dir: str, strict_sorted: bool = True) -> int:
    """Returns 0 if consistent; prints every problem found."""
    d = Path(data_dir)
    files = _present(d)
    problems = []
    if not files:
        problems.append(f"no data files found in {d} (expected one of {UTT_FILES})")
    if not ((d / "wav.scp").exists() or (d / "feats.scp").exists()):
        problems.append("neither wav.scp nor feats.scp present")
    tables = {}
    for f in files:
        try:
            tables[f] = _read(d / f)
        except SystemExit as e:
            problems.append(str(e))
            continue
        keys = list(tables[f])
        if strict_sorted and keys != sorted(keys):
            problems.append(f"{f}: keys not sorted (run fix)")
        empty = [k for k, v in tables[f].items() if f == "text" and not v.strip()]
        if empty:
            problems.append(f"{f}: {len(empty)} empty transcriptions (e.g. {empty[0]})")
    key_sets = {f: set(t) for f, t in tables.items()}
    if key_sets:
        union = set.union(*key_sets.values())
        inter = set.intersection(*key_sets.values())
        if union != inter:
            for f, ks in key_sets.items():
                missing = union - ks
                if missing:
                    ex = sorted(missing)[0]
                    problems.append(
                        f"{f}: missing {len(missing)} utts present elsewhere (e.g. {ex})"
                    )
    # utt2spk must be spk-contiguous in Kaldi; we only require mapping shape
    for p in problems:
        print(f"validate: {p}")
    if problems:
        return 1
    n = len(next(iter(tables.values()))) if tables else 0
    print(f"validate: OK ({n} utterances, files: {', '.join(files)})")
    return 0


def fix(data_dir: str) -> int:
    """Intersect keys across all present files and rewrite sorted."""
    d = Path(data_dir)
    files = _present(d)
    if not files:
        raise SystemExit(f"fix: no data files in {d}")
    tables = {f: _read(d / f) for f in files}
    common = set.intersection(*(set(t) for t in tables.values()))
    dropped = {f: len(t) - len(common) for f, t in tables.items()}
    for f, t in tables.items():
        kept = {k: t[k] for k in sorted(common)}
        (d / f).write_text(
            "".join(f"{k} {v}\n" if v else f"{k}\n" for k, v in kept.items())
        )
    total_drop = sum(dropped.values())
    print(
        f"fix: kept {len(common)} utts"
        + (f", dropped {dropped}" if total_drop else " (nothing to drop)")
    )
    return 0


def subset(
    src: str,
    dst: str,
    first: int | None = None,
    last: int | None = None,
    utt_list: str | None = None,
    spk: List[str] | None = None,
) -> int:
    s, t = Path(src), Path(dst)
    files = _present(s)
    if not files:
        raise SystemExit(f"subset: no data files in {s}")
    tables = {f: _read(s / f) for f in files}
    keys = sorted(set.intersection(*(set(tb) for tb in tables.values())))
    if first is not None:
        keep = keys[:first]
    elif last is not None:
        keep = keys[-last:]
    elif utt_list is not None:
        want = set(Path(utt_list).read_text().split())
        keep = [k for k in keys if k in want]
    elif spk is not None:
        u2s = tables.get("utt2spk")
        if u2s is None:
            raise SystemExit("subset --spk requires utt2spk in the source dir")
        want = set(spk)
        keep = [k for k in keys if u2s.get(k) in want]
    else:
        raise SystemExit("subset: one of --first/--last/--utt_list/--spk required")
    if not keep:
        raise SystemExit("subset: selection is empty")
    t.mkdir(parents=True, exist_ok=True)
    for f, tb in tables.items():
        (t / f).write_text(
            "".join(f"{k} {tb[k]}\n" if tb[k] else f"{k}\n" for k in keep)
        )
    print(f"subset: {len(keep)}/{len(keys)} utts -> {t}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate")
    v.add_argument("dir")
    v.add_argument("--no_sorted", action="store_true")
    f = sub.add_parser("fix")
    f.add_argument("dir")
    s = sub.add_parser("subset")
    s.add_argument("src")
    s.add_argument("dst")
    s.add_argument("--first", type=int)
    s.add_argument("--last", type=int)
    s.add_argument("--utt_list")
    s.add_argument("--spk", nargs="+")
    args = p.parse_args(argv)
    if args.cmd == "validate":
        return validate(args.dir, strict_sorted=not args.no_sorted)
    if args.cmd == "fix":
        return fix(args.dir)
    return subset(
        args.src, args.dst,
        first=args.first, last=args.last,
        utt_list=args.utt_list, spk=args.spk,
    )


if __name__ == "__main__":
    sys.exit(main())
