"""CLI: voice conversion training (reference: espnet/bin/vc_train.py →
espnet/vc/pytorch_backend/vc.py train).

Usage:
  python -m espnet_tpu.bin.vc_train --config conf/train_vc.yaml \
    --train_data src_wav.scp,src_speech,sound \
    --train_data tgt_wav.scp,speech,sound \
    --valid_data ... --expdir exp/vc [--stats_dir exp/vc_stats] \
    [--collect_stats true]
"""
from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng

    apply_jax_platform_env()
    enable_fast_tpu_rng()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_data", action="append", default=[])
    parser.add_argument("--valid_data", action="append", default=[])
    parser.add_argument("--expdir", required=True)
    parser.add_argument("--stats_dir", default=None)
    parser.add_argument("--collect_stats", default="false")
    args, rest = parser.parse_known_args(argv)

    logging.basicConfig(level=logging.INFO)
    from espnet_tpu.tasks import vc
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=vc.DEFAULT_CONFIG)

    def triplets(specs):
        return [tuple(s.split(",")) for s in specs]

    train_data = triplets(args.train_data)
    if args.collect_stats.lower() == "true":
        vc.collect_stats(
            config, train_data, args.stats_dir or args.expdir + "/stats"
        )
        return
    vc.train(
        config, train_data, triplets(args.valid_data), args.expdir, args.stats_dir
    )


if __name__ == "__main__":
    main()
