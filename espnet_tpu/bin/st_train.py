"""CLI: speech translation training (reference: espnet/bin/st_train.py).

Usage:
  python -m espnet_tpu.bin.st_train --config conf/train_st.yaml \
    --train_data wav.scp,speech,sound --train_data text,text,text \
    --train_data src_text,src_text,text --valid_data ... \
    --token_list tgt_tokens.txt [--src_token_list src_tokens.txt] \
    --expdir exp/st
"""
from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None, task="st"):
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng

    apply_jax_platform_env()
    enable_fast_tpu_rng()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train_data", action="append", default=[])
    parser.add_argument("--valid_data", action="append", default=[])
    parser.add_argument("--expdir", required=True)
    parser.add_argument("--token_list", default=None)
    parser.add_argument("--src_token_list", default=None)
    args, rest = parser.parse_known_args(argv)

    logging.basicConfig(level=logging.INFO)
    from espnet_tpu.tasks import st_mt
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=st_mt.DEFAULT_CONFIG)
    if args.token_list:
        config["token_list"] = args.token_list
    if args.src_token_list:
        config["src_token_list"] = args.src_token_list

    def triplets(specs):
        return [tuple(s.split(",")) for s in specs]

    st_mt.train(
        config,
        triplets(args.train_data),
        triplets(args.valid_data),
        args.expdir,
        task=task,
    )


if __name__ == "__main__":
    main()
