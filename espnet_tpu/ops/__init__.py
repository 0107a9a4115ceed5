from espnet_tpu.ops.stft import stft, log_mel_spectrogram, mel_filterbank
from espnet_tpu.ops.mvn import global_mvn, utterance_mvn
from espnet_tpu.ops.specaug import spec_augment

__all__ = [
    "stft",
    "log_mel_spectrogram",
    "mel_filterbank",
    "global_mvn",
    "utterance_mvn",
    "spec_augment",
]
