"""CLI: LM training (reference: espnet2/bin/lm_train.py)."""
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
    parser.add_argument("--token_list", default=None)
    args, rest = parser.parse_known_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.tasks import lm as lm_task
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=lm_task.DEFAULT_CONFIG)
    if args.token_list:
        config["token_list"] = args.token_list
    triplets = lambda specs: [tuple(s.split(",")) for s in specs]
    if config.get("train_mode") == "bptt":
        # truncated BPTT over the concatenated corpus stream
        # (reference espnet/lm/pytorch_backend/lm.py:89 BPTTUpdater)
        lm_task.train_bptt(
            config, triplets(args.train_data), triplets(args.valid_data),
            args.expdir,
        )
    else:
        lm_task.train(config, triplets(args.train_data), triplets(args.valid_data), args.expdir)


if __name__ == "__main__":
    main()
