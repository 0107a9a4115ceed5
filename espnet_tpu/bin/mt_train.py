"""CLI: machine translation training (reference: espnet/bin/mt_train.py).

Usage:
  python -m espnet_tpu.bin.mt_train --config conf/train_mt.yaml \
    --train_data src_text,src_text,text --train_data text,text,text \
    --valid_data ... --token_list tgt_tokens.txt \
    [--src_token_list src_tokens.txt] --expdir exp/mt
"""
from espnet_tpu.bin.st_train import main as _main


def main(argv=None):
    _main(argv, task="mt")


if __name__ == "__main__":
    main()
