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


def test_int16_passthrough_bit_identical(tmp_path, rng):
    """Pre-quantized int16 input (the device-side PCM16 path) writes the
    same bytes as the float path run through encode_pcm16."""
    x = (rng.uniform(-1.0, 1.0, size=(2000, 6))).astype(np.float32)
    p_float = tmp_path / "f.wav"
    p_int = tmp_path / "i.wav"
    wavio.write(p_float, x, 48000, subtype="PCM_16")
    wavio.write(p_int, wavio.encode_pcm16(x), 48000, subtype="PCM_16")
    assert p_float.read_bytes() == p_int.read_bytes()


def test_int16_input_to_compressed_targets(tmp_path, rng):
    """write_audio with int16 input routes through the float encoders
    losslessly (÷32768 is exactly invertible): FLAC output matches the
    float-input FLAC bit for bit."""
    x = (rng.uniform(-0.9, 0.9, size=(3000, 2))).astype(np.float32)
    q = wavio.encode_pcm16(x)
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    wavio.write_audio(a, wavio.decode_pcm16(q), 16000)
    wavio.write_audio(b, q, 16000)
    assert a.read_bytes() == b.read_bytes()


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


def test_rejects_implausible_header_rate(tmp_path, rng):
    """A crafted fmt-chunk sample rate must be a clean ValueError, not a
    multi-GB IR allocation downstream (found by tools/fuzz_campaign.py:
    rates like 2147491648 decoded fine and flowed into int32 jit scalars
    and ~10 s · rate IR sizing)."""
    x = rng.uniform(-0.5, 0.5, size=(256, 1)).astype(np.float32)
    path = tmp_path / "rate.wav"
    wavio.write(path, x, 8000)
    blob = bytearray(path.read_bytes())
    fmt_at = blob.index(b"fmt ")  # rate is bytes 12..16 of the fmt chunk
    for bad_rate in (2147491648, 134225728, wavio.MAX_SAMPLE_RATE + 1, 0):
        blob[fmt_at + 12 : fmt_at + 16] = int(bad_rate).to_bytes(4, "little")
        path.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="sample rate"):
            wavio.read(path)
        # the header-only probe applies the same gate (render_dir buckets
        # and the analyzer UI displays probe metadata without decoding)
        with pytest.raises(ValueError, match="sample rate"):
            wavio.probe(path)
    # the ceiling itself is legal (DSD64)
    blob[fmt_at + 12 : fmt_at + 16] = wavio.MAX_SAMPLE_RATE.to_bytes(4, "little")
    path.write_bytes(bytes(blob))
    _, rate = wavio.read(path)
    assert rate == wavio.MAX_SAMPLE_RATE
    assert wavio.probe(path)["samplerate"] == wavio.MAX_SAMPLE_RATE


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


class TestNonWavFallback:
    """Non-WAV containers: sniff, route to ffmpeg when present, clean error
    otherwise (reference dependency posture, raytracer_studio.py:1013/:1396)."""

    def test_sniff_containers(self):
        assert wavio.sniff_container(b"fLaC" + b"\x00" * 8) == "FLAC"
        assert wavio.sniff_container(b"OggS" + b"\x00" * 8) == "OGG/Vorbis"
        assert wavio.sniff_container(b"ID3\x04" + b"\x00" * 8) == "MP3"
        assert wavio.sniff_container(b"\xff\xfbxx" + b"\x00" * 8) == "MP3"
        assert wavio.sniff_container(b"\x00\x00\x00 ftypM4A " + b"\x00" * 4) == "MP4/M4A"
        assert wavio.sniff_container(b"FORM\x00\x00\x00\x00AIFF") == "AIFF"
        assert wavio.sniff_container(b"RIFF\x00\x00\x00\x00WAVE") == "WAV"
        assert wavio.sniff_container(b"garbage bytes") is None
        # generic MPEG frame sync: CRC-protected MP3, MPEG-2.5, ADTS AAC
        assert wavio.sniff_container(b"\xff\xfa\x90\x00") == "MP3"
        assert wavio.sniff_container(b"\xff\xe3\x18\xc4") == "MP3"
        assert wavio.sniff_container(b"\xff\xf0\x00\x00") == "AAC"
        assert wavio.sniff_container(b"\xff\xf8\x00\x00") == "AAC"
        # bitrate index 0 is FREE FORMAT — legal MPEG, mpg123 decodes it
        assert wavio.sniff_container(b"\xff\xfa\x04\xc4") == "MP3"
        # bitrate index 0xF and samplerate bits 0b11 stay forbidden
        assert wavio.sniff_container(b"\xff\xfa\xf4\xc4") is None
        assert wavio.sniff_container(b"\xff\xfa\x9c\xc4") is None

    def _aiff_bytes(self, samples_i16, rate, form=b"AIFF", comp=None, sowt=False):
        """Hand-assemble an AIFF/AIFC container around int16 samples."""
        import math

        def f80(x):
            e = math.floor(math.log2(x))
            mant = int(x * 2 ** (63 - e))
            return (16383 + e).to_bytes(2, "big") + mant.to_bytes(8, "big")

        n, ch = samples_i16.shape
        comm = ch.to_bytes(2, "big") + n.to_bytes(4, "big") + (16).to_bytes(2, "big")
        comm += f80(rate)
        if comp is not None:
            comm += comp + b"\x00"  # pstring compression name (empty)
        pcm = samples_i16.astype("<i2" if sowt else ">i2").tobytes()
        ssnd = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + pcm
        body = b"COMM" + len(comm).to_bytes(4, "big") + comm + (b"\x00" if len(comm) & 1 else b"")
        body += b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
        return b"FORM" + (4 + len(body)).to_bytes(4, "big") + form + body

    def test_native_aiff_read(self, tmp_path, rng):
        vals = (rng.standard_normal((500, 2)) * 8000).astype(np.int16)
        p = tmp_path / "x.aiff"
        p.write_bytes(self._aiff_bytes(vals, 44100))
        data, rate = wavio.read(p)
        assert rate == 44100 and data.shape == (500, 2)
        np.testing.assert_allclose(data, vals / 32768.0, atol=1e-7)

    def test_native_aifc_sowt_read(self, tmp_path, rng):
        vals = (rng.standard_normal((300, 1)) * 12000).astype(np.int16)
        p = tmp_path / "x.aifc"
        p.write_bytes(self._aiff_bytes(vals, 8000, form=b"AIFC", comp=b"sowt", sowt=True))
        data, rate = wavio.read(p)
        assert rate == 8000 and data.shape == (300, 1)
        np.testing.assert_allclose(data, vals / 32768.0, atol=1e-7)

    def test_compressed_aifc_routes_past_native(self, tmp_path, monkeypatch, rng):
        """Compressed AIFC falls through the native reader into the
        FFmpeg-library tier; this synthetic fixture is not valid ulaw, so
        the chain still ends at the install-ffmpeg contract (real
        compressed files decode in the library tier — see test_lavcio)."""
        monkeypatch.setenv("PATH", str(tmp_path))  # hide any ffmpeg
        vals = np.zeros((10, 1), np.int16)
        p = tmp_path / "c.aifc"
        p.write_bytes(self._aiff_bytes(vals, 8000, form=b"AIFC", comp=b"ulaw"))
        with pytest.raises(ValueError, match="ffmpeg"):
            wavio.read(p)

    def test_truncated_fmt_chunk_valueerror(self, tmp_path):
        """Review regression: an undersized fmt chunk must raise ValueError
        (the CLI error contract), not leak struct.error."""
        import struct

        bad = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
               + b"fmt " + struct.pack("<I", 8) + b"12345678")
        p = tmp_path / "trunc.wav"
        p.write_bytes(bad)
        with pytest.raises(ValueError, match="WAV"):
            wavio.probe(p)
        with pytest.raises(ValueError, match="WAV"):
            wavio.read(p)

    def test_corrupt_ogg_clear_error(self, tmp_path, monkeypatch):
        """OGG decodes natively now — corrupt streams get a clean corruption
        error (no ffmpeg hint, no ffmpeg invocation)."""
        monkeypatch.setenv("PATH", str(tmp_path))  # hide any ffmpeg
        ogg = tmp_path / "x.ogg"
        ogg.write_bytes(b"OggS" + b"\x00" * 64)
        with pytest.raises(ValueError, match="OGG-Datei beschädigt"):
            wavio.read(ogg)

    def test_opus_in_ogg_falls_to_ffmpeg_hint(self, tmp_path, monkeypatch):
        """Opus in an Ogg container is NOT Vorbis: the native layer rejects
        it and the chain ends at the install-ffmpeg contract."""
        from audio_raytracing_studio_tpu.utils import vorbisenc

        monkeypatch.setenv("PATH", str(tmp_path))
        page = vorbisenc._ogg_page(
            0x02, 0, 1, 0, [b"OpusHead" + b"\x01\x02\x00\x00" + b"\x00" * 7]
        )
        ogg = tmp_path / "o.ogg"
        ogg.write_bytes(page)
        with pytest.raises(ValueError, match="ffmpeg"):
            wavio.read(ogg)

    def test_corrupt_mp3_clear_error(self, tmp_path, monkeypatch):
        """A framesync-sniffed corrupt MP3 gets the clean corruption error;
        ID3-prefixed garbage instead falls through the tiers (the tag can
        front ANY container — FLAC included — so corruption can't be
        attributed to MP3) and ends at the tier-chain error."""
        from audio_raytracing_studio_tpu.utils import mp3io

        if not mp3io.decode_available():
            pytest.skip("libmpg123 not present")
        monkeypatch.setenv("PATH", str(tmp_path))  # hide any ffmpeg
        mp3 = tmp_path / "x.mp3"
        # genuine MPEG framesync (layer III, valid bitrate nibble) + garbage
        mp3.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
        with pytest.raises(ValueError, match="MP3-Datei beschädigt"):
            wavio.read(mp3)
        tagged = tmp_path / "t.mp3"
        tagged.write_bytes(b"ID3\x04" + b"\x00" * 64)
        with pytest.raises(ValueError) as ei:
            wavio.read(tagged)
        assert "beschädigt" not in str(ei.value)

    def test_mp3_without_codec_lib_keeps_ffmpeg_contract(
        self, tmp_path, monkeypatch
    ):
        """On images without libmpg123 the chain still ends at the
        install-ffmpeg contract (simulated absence)."""
        from audio_raytracing_studio_tpu.utils import mp3io

        monkeypatch.setattr(mp3io, "decode_available", lambda: False)
        monkeypatch.setenv("PATH", str(tmp_path))  # hide any ffmpeg
        mp3 = tmp_path / "x.mp3"
        mp3.write_bytes(b"ID3\x04" + b"\x00" * 64)
        with pytest.raises(ValueError, match="ffmpeg"):
            wavio.read(mp3)

    def test_corrupt_flac_clear_error(self, tmp_path):
        """FLAC decodes natively now — corrupt streams get a clean error,
        not an ffmpeg hint."""
        flac = tmp_path / "x.flac"
        flac.write_bytes(b"fLaC" + b"\x00" * 64)
        with pytest.raises(ValueError, match="FLAC"):
            wavio.read(flac)

    def test_unknown_bytes_keep_wav_error(self, tmp_path):
        bad = tmp_path / "x.bin"
        bad.write_bytes(b"not audio at all, promise")
        with pytest.raises(ValueError, match="RIFF/WAVE"):
            wavio.read(bad)

    def test_ffmpeg_decode_plumbing(self, tmp_path, monkeypatch):
        """A stub ffmpeg on PATH proves the decode path end-to-end (the
        FFmpeg-library tier is simulated absent — with it present, AAC
        never reaches the binary)."""
        import stat
        import sys

        from audio_raytracing_studio_tpu.utils import lavcio

        monkeypatch.setattr(lavcio, "decode_available", lambda: False)
        stub = tmp_path / "ffmpeg"
        stub.write_text(
            "#!%s\n"
            "import sys, numpy as np\n"
            "sys.path.insert(0, %r)\n"
            "from audio_raytracing_studio_tpu.utils import wavio\n"
            "out = sys.argv[-1]\n"
            "x = np.linspace(-0.5, 0.5, 480, dtype=np.float32)\n"
            "wavio.write(out, np.stack([x, -x], 1), 24000, subtype='FLOAT')\n"
            % (sys.executable, "/root/repo")
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", str(tmp_path))
        # ADTS AAC: a true ffmpeg-only format (mp3 decodes natively now)
        aac = tmp_path / "y.aac"
        aac.write_bytes(b"\xff\xf1\x50\x80" + b"\x00" * 64)
        data, rate = wavio.read(aac)
        assert rate == 24000 and data.shape == (480, 2)
        assert np.isclose(data[0, 0], -0.5)
        # info() rides the same path
        meta = wavio.info(aac)
        assert meta["samplerate"] == 24000 and meta["channels"] == 2

    def test_ffmpeg_failure_surfaces(self, tmp_path, monkeypatch):
        import stat
        import sys

        from audio_raytracing_studio_tpu.utils import lavcio

        monkeypatch.setattr(lavcio, "decode_available", lambda: False)
        stub = tmp_path / "ffmpeg"
        stub.write_text(
            "#!%s\nimport sys\nsys.stderr.write('kaputt')\nsys.exit(1)\n"
            % sys.executable
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", str(tmp_path))
        aac = tmp_path / "z.aac"
        aac.write_bytes(b"\xff\xf1\x50\x80" + b"\x00" * 64)
        with pytest.raises(ValueError, match="kaputt"):
            wavio.read(aac)

    def test_ui_error_contract_for_corrupt_ogg(self, tmp_path, monkeypatch):
        """The app surfaces the native corruption message via 'Fehler beim
        Laden' (ogg decodes natively; no ffmpeg hint for Vorbis anymore)."""
        monkeypatch.setenv("PATH", str(tmp_path))
        from audio_raytracing_studio_tpu.app import api
        from tests.test_app_api import DEFAULT_ARGS

        ogg = tmp_path / "u.ogg"
        ogg.write_bytes(b"OggS" + b"\x00" * 64)
        player, download, msg = api.apply_raytrace_convolution_3d(
            str(ogg), **DEFAULT_ARGS
        )
        assert player is None and download is None
        assert msg.startswith("Fehler beim Laden:") and "beschädigt" in msg

    def test_ui_error_contract_for_aac(self, tmp_path, monkeypatch):
        """A corrupt AAC upload surfaces the pipeline's load-error contract:
        a terminal corruption message from the FFmpeg-library tier when it
        is present, the install-ffmpeg hint on stripped images."""
        monkeypatch.setenv("PATH", str(tmp_path))
        from audio_raytracing_studio_tpu.app import api
        from audio_raytracing_studio_tpu.utils import lavcio
        from tests.test_app_api import DEFAULT_ARGS

        aac = tmp_path / "u.aac"
        aac.write_bytes(b"\xff\xf1\x50\x80" + b"\x00" * 64)
        player, download, msg = api.apply_raytrace_convolution_3d(
            str(aac), **DEFAULT_ARGS
        )
        assert player is None and download is None
        assert msg.startswith("Fehler beim Laden:")
        if lavcio.decode_available():
            assert "beschädigt oder nicht dekodierbar" in msg
        else:
            assert "ffmpeg" in msg


class TestOggFastTier:
    """wavio.read routes .ogg through the libavcodec tier first (uploads
    decode on the serving HTTP thread of a 1-core host — the in-repo
    decoder's 13x realtime starves the dispatch loop on long clips,
    tools/bench_codecs.py), falling back to the native vorbisio decoder
    which keeps the error contract and remains the spec oracle."""

    @staticmethod
    def _make_ogg(tmp_path, seconds=60.0, rate=44100):
        from audio_raytracing_studio_tpu.utils import vorbisenc

        n = int(seconds * rate)
        t = np.arange(n) / rate
        data = np.stack(
            [0.3 * np.sin(2 * np.pi * 440 * t), 0.3 * np.sin(2 * np.pi * 554 * t)],
            axis=1,
        ).astype(np.float32)
        path = tmp_path / "long.ogg"
        vorbisenc.write(path, data, rate)
        return path, data

    def test_long_ogg_decodes_under_budget(self, tmp_path):
        """VERDICT r4 item 2: pin decode of a long stream under a time
        budget.  60 s of stereo Vorbis must decode well above 20x realtime
        — only the C tier can do that (the pure path measures ~13x), so
        this also pins that the fast tier is actually wired in."""
        import time

        from audio_raytracing_studio_tpu.utils import lavcio

        if not lavcio.decode_available():
            pytest.skip("FFmpeg libraries not present")
        path, data = self._make_ogg(tmp_path, seconds=60.0)
        t0 = time.perf_counter()
        out, rate = wavio.read(path)
        elapsed = time.perf_counter() - t0
        assert rate == 44100 and abs(out.shape[0] - data.shape[0]) < 4410
        assert elapsed < 3.0, f"60 s ogg took {elapsed:.1f}s (>20x rt required)"

    def test_lavc_failure_falls_back_to_native(self, tmp_path, monkeypatch):
        """A lavc-tier failure must fall through to the in-repo decoder,
        not surface: the native path is the error-contract owner."""
        from audio_raytracing_studio_tpu.utils import lavcio

        path, data = self._make_ogg(tmp_path, seconds=1.0)

        def broken(_path):
            raise ValueError("synthetic lavc failure")

        monkeypatch.setattr(lavcio, "decode", broken)
        out, rate = wavio.read(path)
        assert rate == 44100 and abs(out.shape[0] - data.shape[0]) < 4410
        n = min(len(out), len(data))
        assert float(np.max(np.abs(out[:n] - data[:n]))) < 0.1
