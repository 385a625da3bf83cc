"""WAV codec tests: round-trips, PCM16 quantization contract, header variants."""

import io

import numpy as np
import pytest

from audio_raytracing_studio_tpu.utils import wavio


def test_pcm16_roundtrip(tmp_path, rng):
    x = (rng.uniform(-0.9, 0.9, size=(4800, 2))).astype(np.float32)
    path = tmp_path / "t.wav"
    wavio.write(path, x, 48000, subtype="PCM_16")
    y, rate = wavio.read(path)
    assert rate == 48000
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) <= 1.0 / 32768.0


def test_float_roundtrip_exact(tmp_path, rng):
    x = rng.standard_normal((1000, 6)).astype(np.float32)
    path = tmp_path / "t6.wav"
    wavio.write(path, x, 44100, subtype="FLOAT")
    y, rate = wavio.read(path)
    assert rate == 44100
    assert np.array_equal(y, x)


def test_extensible_header_for_multichannel(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, size=(100, 8)).astype(np.float32)
    path = tmp_path / "t8.wav"
    wavio.write(path, x, 48000, subtype="PCM_16")
    raw = path.read_bytes()
    assert raw[20:22] == b"\xfe\xff"  # WAVE_FORMAT_EXTENSIBLE
    y, rate = wavio.read(path)
    assert y.shape == (100, 8)


def test_mono_1d_input(tmp_path):
    x = np.linspace(-0.5, 0.5, 100, dtype=np.float32)
    path = tmp_path / "m.wav"
    wavio.write(path, x, 16000)
    y, rate = wavio.read(path)
    assert y.shape == (100, 1)  # always_2d semantics


def test_quantization_round_half_even():
    # 0.5/32768*1.0 scale: value exactly halfway rounds to even (lrintf semantics)
    x = np.array([1.5 / 32768.0, 2.5 / 32768.0], dtype=np.float64)
    q = wavio.encode_pcm16(x)
    assert q[0] == 2 and q[1] == 2


def test_in_memory_stream():
    buf = io.BytesIO()
    x = np.zeros((10, 2), dtype=np.float32)
    wavio.write(buf, x, 8000)
    buf.seek(0)
    y, rate = wavio.read(buf)
    assert rate == 8000 and y.shape == (10, 2)


def test_info(tmp_path):
    x = np.zeros((48000, 2), dtype=np.float32)
    path = tmp_path / "i.wav"
    wavio.write(path, x, 48000)
    meta = wavio.info(path)
    assert meta["duration"] == pytest.approx(1.0)
    assert meta["channels"] == 2


def test_rejects_garbage(tmp_path):
    path = tmp_path / "bad.wav"
    path.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        wavio.read(path)


def test_probe_matches_read(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, size=(12345, 6)).astype(np.float32)
    path = tmp_path / "p.wav"
    wavio.write(path, x, 44100)
    meta = wavio.probe(path)
    assert meta["samplerate"] == 44100
    assert meta["channels"] == 6
    assert meta["frames"] == 12345
    assert meta["bits"] == 16


def test_probe_rejects_garbage(tmp_path):
    path = tmp_path / "g.wav"
    path.write_bytes(b"RIFFxxxxWAVEjunk")
    with pytest.raises(ValueError):
        wavio.probe(path)
