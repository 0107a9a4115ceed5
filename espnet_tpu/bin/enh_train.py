"""CLI: enhancement/separation training (reference:
espnet2/bin/enh_train.py → EnhancementTask.main).

Usage:
  python -m espnet_tpu.bin.enh_train --config conf/train_enh.yaml \
    --train_data wav_mix.scp,speech_mix,sound \
    --train_data wav_spk1.scp,speech_ref1,sound \
    --train_data wav_spk2.scp,speech_ref2,sound \
    --valid_data ... --expdir exp/enh
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
    args, rest = parser.parse_known_args(argv)

    logging.basicConfig(level=logging.INFO)
    from espnet_tpu.tasks import enh
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=enh.DEFAULT_CONFIG)

    def triplets(specs):
        return [tuple(s.split(",")) for s in specs]

    enh.train(
        config, triplets(args.train_data), triplets(args.valid_data), args.expdir
    )


if __name__ == "__main__":
    main()
