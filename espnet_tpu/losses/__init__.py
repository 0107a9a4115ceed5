from espnet_tpu.losses.ctc import ctc_loss, ctc_forced_align
from espnet_tpu.losses.label_smoothing import label_smoothing_loss

__all__ = ["ctc_loss", "ctc_forced_align", "label_smoothing_loss"]
