"""CLI: ASR training (reference: espnet2/bin/asr_train.py).

Usage:
  python -m espnet_tpu.bin.asr_train --config conf/train.yaml \
    --train_data wav.scp,speech,sound --train_data text,text,text \
    --valid_data ... --token_list data/tokens.txt --expdir exp/asr \
    [--stats_dir exp/stats] [--collect_stats true]
Any config key can be overridden with --key value (dotted nesting).
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
    parser.add_argument("--train_data", action="append", default=[],
                        help="path,name,type triplet (repeatable)")
    parser.add_argument("--valid_data", action="append", default=[])
    parser.add_argument("--expdir", required=True)
    parser.add_argument("--stats_dir", default=None)
    parser.add_argument("--collect_stats", default="false")
    parser.add_argument("--token_list", default=None)
    args, rest = parser.parse_known_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from espnet_tpu.tasks import asr as asr_task
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=asr_task.DEFAULT_CONFIG)
    if args.token_list:
        config["token_list"] = args.token_list

    def triplets(specs):
        return [tuple(s.split(",")) for s in specs]

    train_data = triplets(args.train_data)
    valid_data = triplets(args.valid_data)

    if args.collect_stats.lower() == "true":
        from pathlib import Path

        token_list = config["token_list"]
        if isinstance(token_list, str):
            token_list = [
                t for t in Path(token_list).read_text().splitlines() if t
            ]
        asr_task.collect_stats(
            config, train_data, args.stats_dir or args.expdir + "/stats", token_list
        )
        return
    asr_task.train(config, train_data, valid_data, args.expdir, args.stats_dir)


if __name__ == "__main__":
    main()
