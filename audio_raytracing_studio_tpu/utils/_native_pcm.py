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
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


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
_lib.encode_pcm16_interleave.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_int16),
    ctypes.c_int64,
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


def encode_pcm16_interleave(x_cn: np.ndarray) -> np.ndarray:
    """(C, N) float32 channels-leading → (N, C) interleaved int16 (fused)."""
    x_cn = np.ascontiguousarray(x_cn, dtype=np.float32)
    channels, frames = x_cn.shape
    out = np.empty((frames, channels), dtype=np.int16)
    _lib.encode_pcm16_interleave(
        x_cn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        channels,
        frames,
    )
    return out
