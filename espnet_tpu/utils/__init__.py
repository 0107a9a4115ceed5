from espnet_tpu.utils.masks import (
    make_pad_mask,
    make_non_pad_mask,
    subsequent_mask,
)

__all__ = ["make_pad_mask", "make_non_pad_mask", "subsequent_mask"]
