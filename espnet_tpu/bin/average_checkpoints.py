"""CLI: average model checkpoints (reference: utils/average_checkpoints.py,
espnet2/main_funcs/average_nbest_models.py)."""
from __future__ import annotations

import argparse
import pickle
import sys

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpts", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    import jax
    from flax import serialization

    acc = None
    for path in args.ckpts:
        with open(path, "rb") as f:
            sd = pickle.load(f)
        flat = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), sd)
        acc = flat if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, flat
        )
    n = len(args.ckpts)
    avg = jax.tree_util.tree_map(lambda a: np.asarray(a / n, np.float32), acc)
    with open(args.out, "wb") as f:
        pickle.dump(avg, f)
    print(f"averaged {n} checkpoints -> {args.out}")


if __name__ == "__main__":
    main()
