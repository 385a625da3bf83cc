"""ctypes loader for the native FLAC hot loops (utils/_native/flac_core.cc).

Builds the shared library on first import if missing or stale (g++ is part
of the image toolchain).  flacio imports this module optionally and falls
back to its pure-NumPy/Python paths when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_HERE, "flac_core.cc")
_LIB = os.path.join(_HERE, "libflac_core.so")


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
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u64p = ctypes.POINTER(ctypes.c_uint64)
_lib.flac_rice_decode.restype = ctypes.c_int64
_lib.flac_rice_decode.argtypes = [
    _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, _i64p,
]
_lib.flac_rice_encode.restype = ctypes.c_int64
_lib.flac_rice_encode.argtypes = [_u64p, ctypes.c_int64, ctypes.c_int32, _u8p]
_lib.flac_lpc_reconstruct.argtypes = [
    _i64p, ctypes.c_int64, _i64p, ctypes.c_int32, ctypes.c_int32,
]
_lib.flac_crc8.restype = ctypes.c_uint32
_lib.flac_crc8.argtypes = [ctypes.c_char_p, ctypes.c_int64]
_lib.flac_crc16.restype = ctypes.c_uint32
_lib.flac_crc16.argtypes = [ctypes.c_char_p, ctypes.c_int64]


def crc8(data: bytes) -> int:
    return int(_lib.flac_crc8(data, len(data)))


def crc16(data: bytes) -> int:
    return int(_lib.flac_crc16(data, len(data)))


def rice_decode(bits: np.ndarray, pos: int, k: int, n: int) -> tuple:
    """Decode n rice(k) values from the uint8 bit array → (values, new pos)."""
    out = np.empty(n, dtype=np.int64)
    new_pos = _lib.flac_rice_decode(
        bits.ctypes.data_as(_u8p), bits.size, pos, k, n, out.ctypes.data_as(_i64p)
    )
    if new_pos < 0:
        raise EOFError("FLAC bitstream truncated in rice code")
    return out, int(new_pos)


def rice_encode(u: np.ndarray, k: int, total_bits: int) -> np.ndarray:
    """Encode zigzagged uint64 values as a rice(k) uint8 bit array."""
    bits = np.zeros(total_bits, dtype=np.uint8)
    u = np.ascontiguousarray(u, dtype=np.uint64)
    _lib.flac_rice_encode(u.ctypes.data_as(_u64p), u.size, k, bits.ctypes.data_as(_u8p))
    return bits


def lpc_reconstruct(signal: np.ndarray, coeffs_oldest_first: np.ndarray,
                    shift: int) -> np.ndarray:
    """Integer LPC reconstruction (signal holds warmup + residual).

    USE THE RETURN VALUE: for non-int64 or non-contiguous input,
    ascontiguousarray COPIES and the kernel mutates the copy — a caller
    relying on in-place mutation of its own array would silently get no
    reconstruction at all.  int64 contiguous input is reconstructed
    in place and returned as-is."""
    signal = np.ascontiguousarray(signal, dtype=np.int64)
    co = np.ascontiguousarray(coeffs_oldest_first, dtype=np.int64)
    _lib.flac_lpc_reconstruct(
        signal.ctypes.data_as(_i64p), signal.size, co.ctypes.data_as(_i64p),
        co.size, shift,
    )
    return signal
