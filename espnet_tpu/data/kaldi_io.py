"""Pure-python Kaldi ark/scp IO (kaldiio-equivalent subset).

The reference reads Kaldi binary float matrices via kaldiio
(espnet/utils/io_utils.py:14, espnet2/train/dataset.py loader registry);
we keep the on-disk conventions (scp "utt path.ark:offset", binary \\0B
FM/DM headers, CMVN 2×(D+1) stats) so data dirs prepared for the
reference work unchanged.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple, Union

import numpy as np


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if c == b" " or c == b"":
            break
        tok += c
    return tok.decode()


def read_matrix(f) -> np.ndarray:
    """Read one binary Kaldi matrix at the current position."""
    binmark = f.read(2)
    if binmark != b"\0B":
        raise ValueError(f"not kaldi binary data (got {binmark!r})")
    tok = _read_token(f)
    if tok in ("FM", "DM"):
        dtype = np.float32 if tok == "FM" else np.float64
        assert f.read(1) == b"\x04"
        rows = struct.unpack("<i", f.read(4))[0]
        assert f.read(1) == b"\x04"
        cols = struct.unpack("<i", f.read(4))[0]
        data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype=dtype)
        return data.reshape(rows, cols)
    if tok in ("FV", "DV"):
        dtype = np.float32 if tok == "FV" else np.float64
        assert f.read(1) == b"\x04"
        n = struct.unpack("<i", f.read(4))[0]
        return np.frombuffer(f.read(n * dtype().itemsize), dtype=dtype)
    raise ValueError(f"unsupported kaldi token {tok!r}")


def write_matrix(f, mat: np.ndarray):
    mat = np.asarray(mat)
    if mat.ndim == 1:
        tok = b"FV " if mat.dtype != np.float64 else b"DV "
        mat = mat.astype(np.float32 if tok == b"FV " else np.float64)
        f.write(b"\0B" + tok)
        f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
        f.write(mat.tobytes())
    else:
        tok = b"FM " if mat.dtype != np.float64 else b"DM "
        mat = mat.astype(np.float32 if tok == b"FM " else np.float64)
        f.write(b"\0B" + tok)
        f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
        f.write(b"\x04" + struct.pack("<i", mat.shape[1]))
        f.write(mat.tobytes())


def load_scp_entry(rxspecifier: str) -> np.ndarray:
    """Read 'path.ark:offset' (or plain path to a single-matrix file)."""
    if ":" in rxspecifier:
        path, offset = rxspecifier.rsplit(":", 1)
        with open(path, "rb") as f:
            f.seek(int(offset))
            return read_matrix(f)
    with open(rxspecifier, "rb") as f:
        _read_token(f)  # key
        return read_matrix(f)


class ArkScpWriter:
    """Write matrices into a .ark with a matching .scp (kaldiio-style)."""

    def __init__(self, ark_path: Union[str, Path], scp_path: Union[str, Path]):
        Path(ark_path).parent.mkdir(parents=True, exist_ok=True)
        self.ark_path = str(ark_path)
        self.ark = open(ark_path, "wb")
        self.scp = open(scp_path, "w")

    def __setitem__(self, key: str, mat: np.ndarray):
        self.ark.write(key.encode() + b" ")
        offset = self.ark.tell()
        write_matrix(self.ark, mat)
        self.scp.write(f"{key} {self.ark_path}:{offset}\n")

    def close(self):
        self.ark.close()
        self.scp.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_scp(path: Union[str, Path]) -> Dict[str, str]:
    """2-column scp text → ordered {key: value} (read_2column_text)."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            k, _, v = line.partition(" ")
            out[k] = v
    return out


def write_scp(path: Union[str, Path], d: Dict[str, str]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for k, v in d.items():
            f.write(f"{k} {v}\n")


def write_cmvn_stats(path: Union[str, Path], count: float, sum_: np.ndarray, sumsq: np.ndarray):
    """Kaldi 2×(D+1) CMVN stats matrix (global_mvn.py:40-56 convention)."""
    d = sum_.shape[0]
    mat = np.zeros((2, d + 1), dtype=np.float64)
    mat[0, :d] = sum_
    mat[0, d] = count
    mat[1, :d] = sumsq
    with open(path, "wb") as f:
        write_matrix(f, mat)


def read_cmvn_stats(path: Union[str, Path]) -> Tuple[float, np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        mat = read_matrix(f)
    d = mat.shape[1] - 1
    return float(mat[0, d]), mat[0, :d], mat[1, :d]
