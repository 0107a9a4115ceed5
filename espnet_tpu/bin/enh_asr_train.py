"""CLI: joint enhancement + ASR training (reference:
espnet2/tasks/enh_asr.py EnhASRTask).

Usage:
  python -m espnet_tpu.bin.enh_asr_train --config conf/train_enh_asr.yaml \
    --train_data mix.scp,speech_mix,sound \
    --train_data s1.scp,speech_ref1,sound \
    --train_data s2.scp,speech_ref2,sound \
    --train_data text1,text_spk1,text \
    --train_data text2,text_spk2,text \
    --valid_data ... --expdir exp/enh_asr --token_list tokens.txt
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
    from espnet_tpu.tasks import enh_asr
    from espnet_tpu.utils.config import build_config

    config = build_config(rest, defaults=enh_asr.DEFAULT_CONFIG)

    def triplets(specs):
        return [tuple(s.split(",")) for s in specs]

    enh_asr.train(
        config, triplets(args.train_data), triplets(args.valid_data), args.expdir
    )


if __name__ == "__main__":
    main()
