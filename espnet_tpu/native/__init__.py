"""Native (C++) components, built on demand with g++ and loaded via
ctypes. Falls back silently — callers (espnet_tpu.utils.metrics) keep a
pure-python path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libeditdistance.so"
_lib = None


def _build() -> bool:
    src = _DIR / "editdistance.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        raise ImportError("editdistance native lib unavailable")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.edit_distance_i64.restype = ctypes.c_int64
    lib.edit_distance_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.align_ops_i64.restype = None
    _lib = lib
    return lib


class editdistance:
    """API shim: espnet_tpu.native.editdistance.distance(a, b)."""

    _intern: dict = {}

    @classmethod
    def _to_ids(cls, seq):
        out = (ctypes.c_int64 * len(seq))()
        intern = cls._intern
        for i, x in enumerate(seq):
            if isinstance(x, (int,)):
                out[i] = x
            else:
                out[i] = intern.setdefault(x, len(intern))
        return out

    @classmethod
    def distance(cls, a, b) -> int:
        lib = _load()
        ca, cb = cls._to_ids(list(a)), cls._to_ids(list(b))
        return int(lib.edit_distance_i64(ca, len(ca), cb, len(cb)))

    @classmethod
    def align_ops(cls, a, b):
        lib = _load()
        ca, cb = cls._to_ids(list(a)), cls._to_ids(list(b))
        out = (ctypes.c_int64 * 4)()
        lib.align_ops_i64(ca, len(ca), cb, len(cb), out)
        return tuple(out)
