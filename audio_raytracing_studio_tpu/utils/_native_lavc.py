"""ctypes loader for the FFmpeg-library shim (_native/lavc_shim.cc).

Unlike the other _native modules (self-contained hot loops), this one links
the SYSTEM FFmpeg libraries (libavformat/libavcodec 59 + libswresample),
so the build can fail on images without the dev headers or the .so files —
callers (utils/lavcio.py) treat any import error as "tier unavailable" and
fall through to the next decode tier, exactly like a missing ffmpeg binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_HERE, "lavc_shim.cc")
_LIB = os.path.join(_HERE, "liblavc_shim.so")


def _build() -> None:
    # build to a temp path then atomically replace: concurrent importers
    # (e.g. the two-process distributed dryrun) must never dlopen a
    # half-written .so or have their output clobbered mid-link
    tmp = f"{_LIB}.build-{os.getpid()}"
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC,
                "-lavformat", "-lavcodec", "-lavutil", "-lswresample",
            ],
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

_c = ctypes
_f32pp = _c.POINTER(_c.POINTER(_c.c_float))
_lib.lavc_decode_file.restype = _c.c_int
_lib.lavc_decode_file.argtypes = [
    _c.c_char_p, _f32pp, _c.POINTER(_c.c_longlong),
    _c.POINTER(_c.c_int), _c.POINTER(_c.c_int), _c.c_char_p, _c.c_int,
]
_lib.lavc_free_buffer.restype = None
_lib.lavc_free_buffer.argtypes = [_c.POINTER(_c.c_float)]
_lib.lavc_probe_file.restype = _c.c_int
_lib.lavc_probe_file.argtypes = [
    _c.c_char_p, _c.POINTER(_c.c_longlong),
    _c.POINTER(_c.c_int), _c.POINTER(_c.c_int), _c.c_char_p, _c.c_int,
]
_lib.lavc_encode_aac.restype = _c.c_int
_lib.lavc_encode_aac.argtypes = [
    _c.c_char_p, _c.POINTER(_c.c_float), _c.c_longlong,
    _c.c_int, _c.c_int, _c.c_int, _c.c_char_p, _c.c_int,
]

lib = _lib
