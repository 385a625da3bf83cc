"""ctypes loader for the native PCM16 codec (utils/_native/pcm_codec.cc).

Builds the shared library on first import if the checked-in binary is
missing or stale (g++ is part of the image toolchain), and exposes
NumPy-array wrappers.  wavio imports this module optionally and falls back
to the pure-NumPy path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_HERE, "pcm_codec.cc")
_LIB = os.path.join(_HERE, "libpcm_codec.so")


def _build() -> None:
    # build to a temp path then atomically replace: concurrent importers
    # (e.g. the two-process distributed dryrun) must never dlopen a
    # half-written .so or have their output clobbered mid-link
    tmp = f"{_LIB}.build-{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
    _build()

_lib = ctypes.CDLL(_LIB)
_lib.encode_pcm16.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_int16),
    ctypes.c_int64,
]
_lib.decode_pcm16.argtypes = [
    ctypes.POINTER(ctypes.c_int16),
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
]
def encode_pcm16(x: np.ndarray) -> np.ndarray:
    """float32 array → int16 with libsndfile semantics (shape preserved)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.int16)
    _lib.encode_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        x.size,
    )
    return out


def decode_pcm16(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw, dtype=np.int16)
    out = np.empty(raw.shape, dtype=np.float32)
    _lib.decode_pcm16(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size,
    )
    return out
