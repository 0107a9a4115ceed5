"""HDF5 IO (reference: espnet/utils/io_utils.py:557 SoundHDF5File,
espnet2/train/dataset.py hdf5 loader).

SoundHDF5File collects many utterances' audio into one HDF5 file, each
dataset holding an encoded audio byte blob. The reference encodes via
soundfile (flac by default); soundfile is unavailable here, so we encode
WAV via scipy (format="wav") — files written by this class round-trip,
and reference-written files are readable when they used wav encoding.
Raw-array datasets with a "rate" attribute are also accepted.
"""
from __future__ import annotations

import io
from typing import Tuple, Union

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is baked into the image
    h5py = None


def _require_h5py():
    if h5py is None:
        raise RuntimeError("h5py is required for hdf5 IO")


class SoundHDF5File:
    """{uttid: (array, rate)} stored in one .h5 file.

    >>> f = SoundHDF5File('a.wav.h5', 'a')
    >>> f['utt1'] = (np.zeros(100, np.int16), 16000)
    >>> array, rate = f['utt1']
    """

    def __init__(self, filepath, mode="r+", format="wav", dtype="int16", **kw):
        _require_h5py()
        self.filepath = str(filepath)
        self.dtype = dtype
        self.format = format
        self.file = h5py.File(filepath, mode, **kw)

    def create_dataset(self, name, shape=None, data=None, **kwds):
        from scipy.io import wavfile

        array, rate = data
        buf = io.BytesIO()
        wavfile.write(buf, rate, np.asarray(array))
        self.file.create_dataset(
            name, shape=shape, data=np.void(buf.getvalue()), **kwds
        )

    def __setitem__(self, name, data):
        self.create_dataset(name, data=data)

    def __getitem__(self, key) -> Tuple[np.ndarray, int]:
        data = self.file[key][()]
        if isinstance(data, np.void) or (
            isinstance(data, np.ndarray) and data.dtype.kind == "V"
        ):
            from scipy.io import wavfile

            rate, array = wavfile.read(io.BytesIO(data.tobytes()))
            return array, rate
        # raw-array dataset with a rate attribute
        rate = int(self.file[key].attrs.get("rate", 16000))
        return np.asarray(data), rate

    def keys(self):
        return self.file.keys()

    def items(self):
        for k in self.file:
            yield k, self[k]

    def __iter__(self):
        return iter(self.file)

    def __contains__(self, item):
        return item in self.file

    def __len__(self):
        return len(self.file)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.file.close()

    def close(self):
        self.file.close()


def parse_h5_path(path: str) -> Tuple[str, str]:
    """'file.h5:key' → (file, key); kaldi-style colon split on the LAST
    colon so windows-free absolute paths survive."""
    fname, _, key = path.rpartition(":")
    if not fname:
        raise ValueError(f"hdf5 path must be 'file.h5:key', got {path!r}")
    return fname, key


def load_hdf5(path: str) -> np.ndarray:
    """Loader for 'hdf5' scp entries: file.h5:key → array."""
    _require_h5py()
    fname, key = parse_h5_path(path)
    with h5py.File(fname, "r") as f:
        return np.asarray(f[key][()])


def load_sound_hdf5(path: str, normalize: bool = True) -> np.ndarray:
    """Loader for 'sound.hdf5' scp entries: file.h5:key → float32 mono."""
    fname, key = parse_h5_path(path)
    with SoundHDF5File(fname, "r") as f:
        array, rate = f[key]
    if array.ndim > 1:
        array = array[:, 0]
    if normalize and array.dtype == np.int16:
        array = array.astype(np.float32) / 32768.0
    elif normalize and array.dtype == np.int32:
        array = array.astype(np.float32) / 2147483648.0
    else:
        array = array.astype(np.float32)
    return array
