"""CLI: MT decoding (reference: espnet/bin/mt_trans.py). See st_trans."""
from espnet_tpu.bin.st_trans import main as _main


def main(argv=None):
    return _main(argv, task="mt")


if __name__ == "__main__":
    main()
