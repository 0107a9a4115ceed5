"""CLI: TTS training (reference: espnet2/bin/tts_train.py)."""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


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
    parser.add_argument("--token_list", default=None)
    args, rest = parser.parse_known_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.tasks import tts as tts_task
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=tts_task.DEFAULT_CONFIG)
    if args.token_list:
        config["token_list"] = args.token_list
    triplets = lambda specs: [tuple(s.split(",")) for s in specs]
    if args.collect_stats.lower() == "true":
        token_list = config["token_list"]
        if isinstance(token_list, str):
            token_list = [t for t in Path(token_list).read_text().splitlines() if t]
        tts_task.collect_stats(
            config, triplets(args.train_data),
            args.stats_dir or args.expdir + "/stats", token_list,
        )
        return
    tts_task.train(
        config, triplets(args.train_data), triplets(args.valid_data),
        args.expdir, args.stats_dir,
    )


if __name__ == "__main__":
    main()
