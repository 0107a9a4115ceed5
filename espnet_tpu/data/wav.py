"""WAV file IO (soundfile-free; reference uses soundfile via
espnet2/fileio/sound_scp.py:12). PCM16/PCM32/float32 via scipy.io.wavfile,
returned as float32 in [-1, 1].
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import numpy as np
from scipy.io import wavfile


def read_wav(path: Union[str, Path], normalize: bool = True) -> Tuple[int, np.ndarray]:
    rate, data = wavfile.read(str(path))
    if normalize:
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
    return rate, data


def write_wav(path: Union[str, Path], rate: int, data: np.ndarray):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if data.dtype in (np.float32, np.float64):
        data = (np.clip(data, -1.0, 1.0) * 32767.0).astype(np.int16)
    wavfile.write(str(path), rate, data)
