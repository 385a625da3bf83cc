"""Native C++ PCM codec vs the pure-NumPy reference path."""

import numpy as np
import pytest

native = pytest.importorskip("audio_raytracing_studio_tpu.utils._native_pcm")


def numpy_encode(x):
    scaled = np.rint(np.asarray(x, dtype=np.float32) * np.float32(32768.0))
    return np.clip(scaled, -32768, 32767).astype(np.int16)


def test_encode_matches_numpy_bitexact(rng):
    x = rng.uniform(-1.2, 1.2, size=100_000).astype(np.float32)
    # include exact half-LSB values and the saturation edges
    x[:4] = [1.5 / 32768.0, 2.5 / 32768.0, 1.0, -1.0]
    assert np.array_equal(native.encode_pcm16(x), numpy_encode(x))


def test_decode_roundtrip(rng):
    q = rng.integers(-32768, 32767, size=10_000).astype(np.int16)
    back = native.decode_pcm16(q)
    assert back.dtype == np.float32
    assert np.array_equal(native.encode_pcm16(back), q)


def test_wavio_uses_native_path(tmp_path, rng):
    from audio_raytracing_studio_tpu.utils import wavio

    assert wavio._npcm is not None  # loader succeeded in this image
    x = rng.uniform(-0.9, 0.9, size=(1000, 2)).astype(np.float32)
    p = tmp_path / "n.wav"
    wavio.write(p, x, 48000)
    y, rate = wavio.read(p)
    assert np.max(np.abs(y - x)) <= 1.0 / 32768.0
