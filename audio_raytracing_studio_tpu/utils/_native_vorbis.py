"""ctypes loader for the native Vorbis hot loops (_native/vorbis_core.cc).

Builds the shared library on first import if missing or stale (g++ is part
of the image toolchain).  vorbisenc/vorbisio import this module optionally
and fall back to their pure-NumPy paths when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_HERE, "vorbis_core.cc")
_LIB = os.path.join(_HERE, "libvorbis_core.so")


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
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)
_lib.vorbis_pack_lsb.restype = ctypes.c_int64
_lib.vorbis_pack_lsb.argtypes = [_i32p, _u8p, ctypes.c_int64, _u8p]
_lib.vorbis_ogg_crc.restype = ctypes.c_uint32
_lib.vorbis_ogg_crc.argtypes = [ctypes.c_char_p, ctypes.c_int64]
_lib.vorbis_vq_run.restype = ctypes.c_int64
_lib.vorbis_vq_run.argtypes = [
    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
    _i64p, ctypes.c_int32, _f32p, ctypes.c_int32, ctypes.c_int64, _f32p,
]


class BookHandle:
    """Prepped ctypes pointers for one codebook (ctypes marshalling per
    call was the dominant decode cost once the loop itself went native)."""

    __slots__ = ("fast_ptr", "vec_ptr", "dims", "scratch", "scratch_ptr")

    def __init__(self, fast: np.ndarray, vectors: np.ndarray, max_count: int):
        self.fast_ptr = fast.ctypes.data_as(_i64p)
        self.vec_ptr = vectors.ctypes.data_as(_f32p)
        self.dims = int(vectors.shape[1])
        self.scratch = np.empty(max_count * self.dims, dtype=np.float32)
        self.scratch_ptr = self.scratch.ctypes.data_as(_f32p)


def vq_run(
    data: bytes, bitpos: int, handle: BookHandle, count: int,
    fast_bits: int = 10,
) -> int:
    """Decode `count` VQ entries into handle.scratch (count·dims float32).

    ``fast_bits`` is the width of the caller's fast lookup table — it MUST
    equal vorbisio._FAST_BITS (the table builder): a mismatch indexes the
    wrong half of the table and decodes plausible-but-wrong VQ entries
    instead of reporting a miss.  Callers pass their constant explicitly
    so the two cannot silently drift.

    Returns the new absolute bit position, or -1 (fast-table miss or
    packet exhaustion — caller falls back to the Python path)."""
    return int(
        _lib.vorbis_vq_run(
            data, len(data), bitpos,
            handle.fast_ptr, int(fast_bits),
            handle.vec_ptr, handle.dims, count,
            handle.scratch_ptr,
        )
    )


def pack_lsb(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """LSB-first pack: values[i]'s low nbits[i] bits, in order → bytes."""
    v = np.ascontiguousarray(values, dtype=np.int32)
    b = np.ascontiguousarray(nbits, dtype=np.uint8)
    total = int(b.sum(dtype=np.int64))
    out = np.zeros((total + 7) // 8, dtype=np.uint8)
    _lib.vorbis_pack_lsb(
        v.ctypes.data_as(_i32p),
        b.ctypes.data_as(_u8p),
        len(v),
        out.ctypes.data_as(_u8p),
    )
    return out.tobytes()


def ogg_crc(data: bytes) -> int:
    return int(_lib.vorbis_ogg_crc(data, len(data)))
