"""CLI: merge collect-stats outputs from parallel shards
(reference: espnet2/bin/aggregate_stats_dirs.py)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_dirs", nargs="+", required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args(argv)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    count = 0.0
    ssum = ssq = None
    shape_files: dict = {}
    for d in args.input_dirs:
        d = Path(d)
        npz = d / "feats_stats.npz"
        if npz.exists():
            st = np.load(npz)
            count += float(st["count"])
            ssum = st["sum"] if ssum is None else ssum + st["sum"]
            ssq = st["sum_square"] if ssq is None else ssq + st["sum_square"]
        for sf in d.glob("*_shape"):
            shape_files.setdefault(sf.name, []).append(sf.read_text())
    if ssum is not None:
        np.savez(out / "feats_stats.npz", count=count, sum=ssum, sum_square=ssq)
    for name, parts in shape_files.items():
        (out / name).write_text("".join(parts))
    print(f"aggregated {len(args.input_dirs)} stats dirs -> {out}")


if __name__ == "__main__":
    main()
