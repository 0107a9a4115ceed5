"""CLI: pack a trained model (config + ckpt + stats + token list) into a
single zip for distribution (reference: espnet2/bin/pack.py,
main_funcs/pack_funcs.py). unpack restores the directory; inference
loads straight from the unpacked dir via build_model_from_file.
"""
from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path


def pack(files, out):
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            f = Path(f)
            z.write(f, f.name)
    print(f"packed {len(files)} files -> {out}")


def unpack(archive, out_dir):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(out)
    print(f"unpacked -> {out}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("pack")
    p.add_argument("--files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    u = sub.add_parser("unpack")
    u.add_argument("--archive", required=True)
    u.add_argument("--out_dir", required=True)
    args = parser.parse_args(argv)
    if args.cmd == "pack":
        pack(args.files, args.out)
    else:
        unpack(args.archive, args.out_dir)


if __name__ == "__main__":
    main()
