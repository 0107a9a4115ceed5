"""Audio file IO (soundfile-free; reference uses soundfile via
espnet2/fileio/sound_scp.py:12). PCM16/PCM32/float32 via scipy.io.wavfile,
returned as float32 in [-1, 1]. NIST SPHERE (.sph) support replaces the
reference's sph2pipe C tool (egs/mini_an4/asr1/run.sh uses sph2pipe for
the AN4 corpus).
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import numpy as np
from scipy.io import wavfile


def read_sph(path: Union[str, Path], normalize: bool = True) -> Tuple[int, np.ndarray]:
    """Read a NIST SPHERE file (plain-PCM coding, the AN4 corpus format).

    The header is `NIST_1A\\n<header_bytes>\\n` followed by `key -type value`
    lines up to `end_head`, then raw PCM. Shorten-compressed SPHERE is not
    supported (AN4 ships uncompressed pcm).
    """
    raw = Path(path).read_bytes()
    if not raw.startswith(b"NIST_1A"):
        raise ValueError(f"not a NIST SPHERE file: {path}")
    header_size = int(raw[8:16].split()[0])
    fields = {}
    for line in raw[:header_size].decode("ascii", "replace").splitlines()[2:]:
        parts = line.split(None, 2)
        if not parts or parts[0] == "end_head":
            break
        if len(parts) == 3:
            key, typ, val = parts
            if typ.startswith("-i"):
                fields[key] = int(val)
            else:
                fields[key] = val
    coding = fields.get("sample_coding", "pcm")
    if "pcm" not in str(coding):
        raise ValueError(f"unsupported SPHERE sample_coding={coding!r} in {path}")
    n_bytes = fields.get("sample_n_bytes", 2)
    rate = fields.get("sample_rate", 16000)
    count = fields.get("sample_count")
    byte_fmt = str(fields.get("sample_byte_format", "01"))
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[n_bytes]
    data = np.frombuffer(raw[header_size:], dtype=dtype)
    if n_bytes > 1 and byte_fmt == "10":  # big-endian
        data = data.byteswap()
    n_ch = fields.get("channel_count", 1)
    if count is not None:
        data = data[: count * n_ch]
    if n_ch > 1:
        data = data.reshape(-1, n_ch)
    if normalize:
        if dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        else:
            data = (data.astype(np.float32) - 128.0) / 128.0
    return rate, data


def read_audio(path: Union[str, Path], normalize: bool = True) -> Tuple[int, np.ndarray]:
    """Read audio by extension: .sph → SPHERE, everything else → wav."""
    if str(path).lower().endswith(".sph"):
        return read_sph(path, normalize=normalize)
    return read_wav(path, normalize=normalize)


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
