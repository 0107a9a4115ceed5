"""CLI: split scp files into N shards for array-job parallel decode
(reference: espnet2/bin/split_scps.py)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scps", nargs="+", required=True)
    parser.add_argument("--num_splits", type=int, required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args(argv)

    from espnet_tpu.data.kaldi_io import read_scp, write_scp

    out = Path(args.output_dir)
    for scp in args.scps:
        table = list(read_scp(scp).items())
        name = Path(scp).name
        per = (len(table) + args.num_splits - 1) // args.num_splits
        for i in range(args.num_splits):
            shard = dict(table[i * per: (i + 1) * per])
            write_scp(out / f"split{args.num_splits}" / str(i + 1) / name, shard)
    (out / f"split{args.num_splits}" / "num_splits").parent.mkdir(
        parents=True, exist_ok=True
    )
    (out / f"split{args.num_splits}" / "num_splits").write_text(
        str(args.num_splits)
    )
    print(f"split into {args.num_splits} shards under {out}")


if __name__ == "__main__":
    main()
