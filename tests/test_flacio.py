"""Native FLAC codec tests (utils/flacio.py).

Round-trip bit-exactness across depths/channels/blockings, known-answer CRC
vectors, decode-side coverage of hand-assembled spec features the encoder
never emits (LPC subframes, rice2 residuals, multi-partition residuals,
wasted bits), native-vs-pure-Python equivalence, corruption detection, and
the wavio/analyzer integration (the reference reads FLAC via soundfile at
raytracer_studio.py:1013; this image has no soundfile/ffmpeg).
"""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

from audio_raytracing_studio_tpu.utils import flacio, wavio
from audio_raytracing_studio_tpu.utils.flacio import BitWriter


def _quantize(sig: np.ndarray, bps: int) -> np.ndarray:
    scale = 1 << (bps - 1)
    return np.clip(np.round(np.atleast_2d(sig.T).T * scale), -scale, scale - 1).astype(
        np.int64
    )


def _roundtrip(sig: np.ndarray, rate: int, bps: int = 16, blocksize: int = 4096):
    buf = io.BytesIO()
    flacio.write(buf, sig, rate, bits_per_sample=bps, blocksize=blocksize)
    buf.seek(0)
    out, out_rate = flacio.read(buf)
    return out, out_rate, buf.getvalue()


class TestCRC:
    def test_crc8_known_answer(self):
        # CRC-8 poly 0x07, init 0 ("123456789" → 0xF4)
        assert flacio.crc8(b"123456789") == 0xF4

    def test_crc16_known_answer(self):
        # CRC-16/UMTS: poly 0x8005 MSB-first, init 0 ("123456789" → 0xFEE8)
        assert flacio.crc16(b"123456789") == 0xFEE8

    def test_pure_python_matches_native(self, monkeypatch):
        data = bytes(range(256)) * 3
        native8, native16 = flacio.crc8(data), flacio.crc16(data)
        monkeypatch.setattr(flacio, "_nf", None)
        assert flacio.crc8(data) == native8
        assert flacio.crc16(data) == native16


class TestRoundTrip:
    @pytest.mark.parametrize("bps", [8, 16, 24])
    @pytest.mark.parametrize("channels", [1, 2, 3])
    def test_depths_and_channels(self, bps, channels):
        rng = np.random.default_rng(bps * 10 + channels)
        rate = 16000
        t = np.arange(9000) / rate
        sig = np.stack(
            [
                0.5 * np.sin(2 * np.pi * (100 + 70 * c) * t)
                + 0.02 * rng.standard_normal(t.size)
                for c in range(channels)
            ],
            axis=1,
        ).astype(np.float32)
        out, out_rate, _ = _roundtrip(sig, rate, bps=bps)
        assert out_rate == rate
        assert out.shape == sig.shape
        expect = _quantize(sig, bps).astype(np.float32) / (1 << (bps - 1))
        np.testing.assert_array_equal(out, expect)

    def test_partial_last_frame_and_exact_multiple(self):
        rate = 8000
        for n in (4096 * 3, 4096 * 2 + 517, 100, 1):
            rng = np.random.default_rng(n)
            sig = (0.3 * rng.standard_normal((n, 2))).astype(np.float32)
            out, _, _ = _roundtrip(sig, rate)
            assert out.shape == (n, 2)
            expect = _quantize(sig, 16).astype(np.float32) / 32768.0
            np.testing.assert_array_equal(out, expect)

    def test_constant_and_silence(self):
        sig = np.full((5000, 2), 0.25, dtype=np.float32)
        out, _, raw = _roundtrip(sig, 44100)
        np.testing.assert_array_equal(out, np.full((5000, 2), 8192 / 32768.0))
        # constant blocks must compress drastically
        assert len(raw) < 5000 * 2 * 2 / 10
        out, _, _ = _roundtrip(np.zeros((3000, 1), np.float32), 48000)
        np.testing.assert_array_equal(out, np.zeros((3000, 1), np.float32))

    def test_int_input_passthrough(self):
        rng = np.random.default_rng(3)
        sig = rng.integers(-(1 << 15), 1 << 15, size=(4000, 2)).astype(np.int32)
        buf = io.BytesIO()
        flacio.write(buf, sig, 22050)
        buf.seek(0)
        out, rate = flacio.read(buf)
        assert rate == 22050
        np.testing.assert_array_equal(np.round(out * 32768.0).astype(np.int64), sig)

    def test_compresses_tonal_audio(self):
        rate = 48000
        t = np.arange(rate) / rate
        sig = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        _, _, raw = _roundtrip(sig, rate)
        assert len(raw) < 0.7 * sig.size * 2  # beats raw PCM16 by >30%

    def test_stereo_decorrelation_modes_roundtrip(self):
        rate = 16000
        t = np.arange(8000) / rate
        rng = np.random.default_rng(11)
        base = 0.4 * np.sin(2 * np.pi * 220 * t)
        noise = 0.1 * rng.standard_normal(t.size)
        cases = {
            "identical (side≈0)": np.stack([base, base], 1),
            "left quiet": np.stack([0.001 * noise, base + noise], 1),
            "right quiet": np.stack([base + noise, 0.001 * noise], 1),
            "uncorrelated": np.stack([noise, rng.standard_normal(t.size) * 0.1], 1),
        }
        for name, sig in cases.items():
            sig = sig.astype(np.float32)
            out, _, _ = _roundtrip(sig, rate)
            expect = _quantize(sig, 16).astype(np.float32) / 32768.0
            np.testing.assert_array_equal(out, expect, err_msg=name)

    def test_pure_python_encoder_decoder_match_native(self, monkeypatch):
        rng = np.random.default_rng(5)
        sig = (0.2 * rng.standard_normal((3000, 2))).astype(np.float32)
        out_native, _, raw_native = _roundtrip(sig, 16000)
        monkeypatch.setattr(flacio, "_nf", None)
        out_pure, _, raw_pure = _roundtrip(sig, 16000)
        assert raw_pure == raw_native  # byte-identical streams
        np.testing.assert_array_equal(out_pure, out_native)

    def test_truncation_and_bitflip_fuzz(self):
        """Decoder robustness: mangled streams raise cleanly, never hang."""
        rng = np.random.default_rng(99)
        sig = (0.3 * rng.standard_normal((6000, 2))).astype(np.float32)
        buf = io.BytesIO()
        flacio.write(buf, sig, 16000, blocksize=1024)
        raw = buf.getvalue()
        for cut in rng.integers(5, len(raw) - 1, size=12):
            try:
                flacio.read(io.BytesIO(raw[: int(cut)]))
            except (ValueError, EOFError):
                pass  # any clean error is acceptable
        for _ in range(12):
            mangled = bytearray(raw)
            mangled[int(rng.integers(4, len(raw)))] ^= int(rng.integers(1, 256))
            try:
                flacio.read(io.BytesIO(bytes(mangled)))
            except (ValueError, EOFError):
                pass

    def test_corruption_detected(self):
        sig = (0.3 * np.sin(np.arange(6000) / 10)).astype(np.float32)
        buf = io.BytesIO()
        flacio.write(buf, sig, 8000)
        raw = bytearray(buf.getvalue())
        raw[len(raw) // 2] ^= 0x01  # flip a bit mid-frame
        with pytest.raises((ValueError, EOFError)):
            flacio.read(io.BytesIO(bytes(raw)))


class TestMetadataRobustness:
    def _with_padding_block(self, raw: bytes, pad_len: int) -> bytes:
        """Insert a PADDING metadata block after STREAMINFO (tagger layout)."""
        assert raw[:4] == b"fLaC" and raw[4] == 0x80  # STREAMINFO, last-flag
        si_len = int.from_bytes(raw[5:8], "big")
        out = bytearray(raw[:4])
        out += bytes([0x00]) + raw[5:8] + raw[8 : 8 + si_len]  # clear last
        out += bytes([0x80 | 0x01]) + pad_len.to_bytes(3, "big")  # PADDING
        out += bytes(pad_len)
        out += raw[8 + si_len :]
        return bytes(out)

    def test_probe_with_metadata_past_64k(self, tmp_path):
        """probe() must walk metadata chains larger than its initial read
        window (embedded album art routinely exceeds 64 KiB)."""
        sig = (0.3 * np.sin(np.arange(4000) / 9)).astype(np.float32)
        buf = io.BytesIO()
        flacio.write(buf, sig, 8000)
        big = self._with_padding_block(buf.getvalue(), 200_000)
        path = tmp_path / "art.flac"
        path.write_bytes(big)
        info = flacio.probe(path)
        assert info["frames"] == 4000 and info["samplerate"] == 8000
        out, rate = flacio.read(path)  # decode survives the padding too
        assert out.shape[0] == 4000 and rate == 8000
        assert wavio.probe(path)["frames"] == 4000  # the wavio route as well

    def test_probe_truncated_metadata_raises_valueerror(self, tmp_path):
        # short STREAMINFO body: the ValueError contract, not a raw EOFError
        path = tmp_path / "trunc.flac"
        path.write_bytes(b"fLaC" + bytes([0x80]) + (10).to_bytes(3, "big") + bytes(10))
        with pytest.raises(ValueError):
            flacio.probe(path)
        with pytest.raises(ValueError):
            wavio.probe(path)

    def test_blocksize_out_of_range_rejected(self):
        sig = np.zeros(100, np.float32)
        for bad in (8, 65536):
            with pytest.raises(ValueError, match="blocksize"):
                flacio.write(io.BytesIO(), sig, 8000, blocksize=bad)

    def test_integer_input_out_of_range_rejected(self):
        # write_sint would silently wrap 40000 → -25536 at 16 bits and the
        # MD5 would be computed over the unwrapped value (corrupt stream)
        with pytest.raises(ValueError, match="16-bit range"):
            flacio.write(io.BytesIO(), np.array([40000], np.int32), 8000)
        # in-range integers still round-trip
        buf = io.BytesIO()
        flacio.write(buf, np.array([-32768, 32767, 0], np.int32), 8000)
        buf.seek(0)
        out, _ = flacio.read(buf)
        assert out.shape[0] == 3


# ---------------------------------------------------------------------------
# hand-assembled decode features the encoder never emits
# ---------------------------------------------------------------------------


def _container(frames_bytes: bytes, rate: int, channels: int, bps: int,
               total: int) -> bytes:
    si = BitWriter()
    si.write_uint(4096, 16)
    si.write_uint(4096, 16)
    si.write_uint(0, 24)
    si.write_uint(0, 24)
    si.write_uint(rate, 20)
    si.write_uint(channels - 1, 3)
    si.write_uint(bps - 1, 5)
    si.write_uint(total, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # zero MD5 → check skipped
    out = flacio.MAGIC + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    return out + streaminfo + frames_bytes


def _frame_header(blocksize: int, channels: int, bps: int) -> bytes:
    w = BitWriter()
    w.write_uint(0b11111111111110, 14)
    w.write_uint(0, 1)
    w.write_uint(0, 1)
    w.write_uint(7, 4)  # blocksize-1 in 16 bits at header end
    w.write_uint(0, 4)  # rate from STREAMINFO
    w.write_uint(channels - 1, 4)
    w.write_uint(flacio._BPS_CODES[bps], 3)
    w.write_uint(0, 1)
    w.write_utf8_number(0)
    w.write_uint(blocksize - 1, 16)
    header = w.getvalue()
    return header + bytes([flacio.crc8(header)])


def _wrap_frame(header: bytes, body: BitWriter) -> bytes:
    payload = header + body.getvalue()
    return payload + flacio.crc16(payload).to_bytes(2, "big")


class TestHandAssembledDecode:
    def test_lpc_subframe(self):
        """LPC decode must match the spec's integer recurrence exactly."""
        rng = np.random.default_rng(21)
        blocksize, bps = 600, 16
        order, precision, shift = 3, 12, 10
        # newest-first; stable predictor (|gain| < 1)
        coeffs = np.array([700, -300, 100], dtype=np.int64)
        warmup = rng.integers(-2000, 2000, order).astype(np.int64)
        residual = rng.integers(-60, 60, blocksize - order).astype(np.int64)

        # expected reconstruction (newest-first coefficient convention)
        sig = np.empty(blocksize, dtype=np.int64)
        sig[:order] = warmup
        for i in range(order, blocksize):
            acc = sum(int(coeffs[j]) * int(sig[i - 1 - j]) for j in range(order))
            sig[i] = (acc >> shift) + residual[i - order]
        assert np.abs(sig).max() < 1 << (bps - 1), "test vector overflowed"

        body = BitWriter()
        body.write_uint(0, 1)
        body.write_uint(32 + (order - 1), 6)  # LPC, order
        body.write_uint(0, 1)  # no wasted bits
        for v in warmup.tolist():
            body.write_sint(int(v), bps)
        body.write_uint(precision - 1, 4)
        body.write_sint(shift, 5)
        for c in coeffs.tolist():
            body.write_sint(int(c), precision)
        body.write_uint(0, 2)  # rice method 0
        body.write_uint(0, 4)  # partition order 0
        body.write_uint(6, 4)  # rice parameter
        body.write_rice_block(residual, 6)

        frame = _wrap_frame(_frame_header(blocksize, 1, bps), body)
        data = _container(frame, 8000, 1, bps, blocksize)
        out, rate = flacio.read(io.BytesIO(data))
        np.testing.assert_array_equal(
            np.round(out[:, 0] * 32768.0).astype(np.int64), sig
        )

    def test_rice2_and_partitions(self):
        """Method-1 (5-bit param) residuals over 4 partitions."""
        rng = np.random.default_rng(8)
        blocksize, bps, order = 512, 16, 1
        warmup = np.array([100], dtype=np.int64)
        residual = rng.integers(-2000, 2000, blocksize - order).astype(np.int64)
        expected = warmup[0] + np.concatenate([[0], residual]).cumsum()

        body = BitWriter()
        body.write_uint(0, 1)
        body.write_uint(8 + order, 6)  # FIXED order 1
        body.write_uint(0, 1)
        body.write_sint(int(warmup[0]), bps)
        body.write_uint(1, 2)  # rice2
        body.write_uint(2, 4)  # partition order 2 → 4 partitions
        per = blocksize // 4
        o = 0
        for p in range(4):
            n = per - (order if p == 0 else 0)
            body.write_uint(11, 5)
            body.write_rice_block(residual[o : o + n], 11)
            o += n

        frame = _wrap_frame(_frame_header(blocksize, 1, bps), body)
        data = _container(frame, 16000, 1, bps, blocksize)
        out, _ = flacio.read(io.BytesIO(data))
        np.testing.assert_array_equal(
            np.round(out[:, 0] * 32768.0).astype(np.int64), expected
        )

    def test_escape_partition(self):
        """Escape code (param 0b11111 in rice2) stores raw n-bit residuals."""
        blocksize, bps = 64, 16
        residual = np.arange(-32, 31).astype(np.int64)  # 63 values, order 1
        warmup = np.array([7], dtype=np.int64)
        expected = warmup[0] + np.concatenate([[0], residual]).cumsum()

        body = BitWriter()
        body.write_uint(0, 1)
        body.write_uint(8 + 1, 6)
        body.write_uint(0, 1)
        body.write_sint(7, bps)
        body.write_uint(1, 2)  # rice2
        body.write_uint(0, 4)
        body.write_uint(31, 5)  # escape
        body.write_uint(7, 5)  # raw width
        for v in residual.tolist():
            body.write_sint(int(v), 7)

        frame = _wrap_frame(_frame_header(blocksize, 1, bps), body)
        data = _container(frame, 8000, 1, bps, blocksize)
        out, _ = flacio.read(io.BytesIO(data))
        np.testing.assert_array_equal(
            np.round(out[:, 0] * 32768.0).astype(np.int64), expected
        )

    def test_wasted_bits(self):
        """A subframe with 2 wasted bits shifts decoded samples left by 2."""
        blocksize, bps, wasted = 128, 16, 2
        vals = (np.arange(blocksize) - 64).astype(np.int64) * 4  # low 2 bits zero
        body = BitWriter()
        body.write_uint(0, 1)
        body.write_uint(1, 6)  # VERBATIM
        body.write_uint(1, 1)  # wasted-bits flag
        # unary-coded (wasted - 1): one zero then terminator
        body.write_uint(0, wasted - 1)
        body.write_uint(1, 1)
        for v in (vals >> wasted).tolist():
            body.write_sint(int(v), bps - wasted)

        frame = _wrap_frame(_frame_header(blocksize, 1, bps), body)
        data = _container(frame, 8000, 1, bps, blocksize)
        out, _ = flacio.read(io.BytesIO(data))
        np.testing.assert_array_equal(
            np.round(out[:, 0] * 32768.0).astype(np.int64), vals
        )


class TestIntegration:
    def test_wavio_reads_flac(self, tmp_path):
        rate = 16000
        t = np.arange(8000) / rate
        sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        path = str(tmp_path / "clip.flac")
        flacio.write(path, sig, rate)
        data, got_rate = wavio.read(path)
        assert got_rate == rate
        assert data.shape == (8000, 1)
        expect = _quantize(sig, 16).astype(np.float32) / 32768.0
        np.testing.assert_array_equal(data, expect)

    def test_wavio_probe_flac(self, tmp_path):
        path = str(tmp_path / "probe.flac")
        flacio.write(path, np.zeros((12345, 2), np.float32), 44100)
        meta = wavio.probe(path)
        assert meta["samplerate"] == 44100
        assert meta["channels"] == 2
        assert meta["frames"] == 12345
        assert meta["bits"] == 16

    def test_analyzer_convert_wav_flac_wav(self, tmp_path):
        from audio_raytracing_studio_tpu.cli import analyzer

        rate = 8000
        rng = np.random.default_rng(2)
        sig = (0.3 * rng.standard_normal((6000, 2))).astype(np.float32)
        wav1 = str(tmp_path / "a.wav")
        flac = str(tmp_path / "a.flac")
        wav2 = str(tmp_path / "b.wav")
        wavio.write(wav1, sig, rate, subtype="PCM_16")
        analyzer.convert(wav1, flac)
        analyzer.convert(flac, wav2)
        d1, r1 = wavio.read(wav1)
        d2, r2 = wavio.read(wav2)
        assert r1 == r2 == rate
        np.testing.assert_array_equal(d1, d2)

    def test_render_cli_flac_output(self, tmp_path):
        """FLAC as a render *target*: .flac extension routes to the native
        encoder (the reference writes WAV only, raytracer_studio.py:1084)."""
        from audio_raytracing_studio_tpu.cli.render import main

        src = tmp_path / "in.wav"
        t = np.arange(8000) / 8000
        wavio.write(src, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 8000)
        out = tmp_path / "out.flac"
        rc = main([str(src), str(out), "--layout", "Stereo", "--room-size", "40",
                   "--seed", "1"])
        assert rc == 0 and out.exists()
        data, rate = flacio.read(out)
        assert rate == 8000 and data.shape[1] == 2
        # round-trips through the generic reader too
        data2, _ = wavio.read(out)
        assert np.array_equal(data, data2)

    def test_normalize_to_flac_target(self, tmp_path, rng):
        from audio_raytracing_studio_tpu.cli.analyzer import normalize_to_lufs

        src = tmp_path / "in.wav"
        wavio.write(src, (0.3 * rng.standard_normal(16000)).astype(np.float32), 8000)
        out = tmp_path / "norm.flac"
        res = normalize_to_lufs(str(src), str(out), target_lufs=-20.0)
        assert abs(res["output_lufs"] + 20.0) < 0.4
        assert flacio.probe(out)["samplerate"] == 8000

    def test_render_pipeline_accepts_flac_input(self, tmp_path):
        """The full orchestrator path renders a FLAC upload (VERDICT gap 1)."""
        from audio_raytracing_studio_tpu.app import api

        rate = 8000
        t = np.arange(4000) / rate
        sig = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        path = str(tmp_path / "in.flac")
        flacio.write(path, sig, rate)
        player, download, metrics = api.apply_raytrace_convolution_3d(
            path, None, False, "Room", 100.0, 0.5, 0.3, 0.8, 0.6,
            0.5, 0.8, 1.0, 1.0, 0.5, 0.5, 0.5, "Holz", "Stereo", seed=4,
        )
        assert download is not None and os.path.exists(download)
        assert "LUFS" in metrics
        out, out_rate = wavio.read(download)
        assert out_rate == rate
        assert out.shape[0] > sig.size  # reverb tail appended


class TestFrameBoundaryTruncation:
    def test_truncation_at_frame_boundary_raises(self):
        """A stream cut exactly at a frame boundary passes every per-frame
        CRC; the decoder must still detect the missing samples (ADVICE r2)."""
        rng = np.random.default_rng(7)
        sig = (0.3 * rng.standard_normal((4096, 1))).astype(np.float32)
        buf = io.BytesIO()
        flacio.write(buf, sig, 16000, blocksize=1024)
        raw = buf.getvalue()
        # find the start of the last frame by sync code (0xFF 0xF8) scanning
        # backwards; cutting there leaves N-1 intact frames
        cut = raw.rfind(b"\xff\xf8")
        assert cut > 42  # past STREAMINFO
        with pytest.raises(ValueError, match="truncated"):
            flacio.read(io.BytesIO(raw[:cut]))


class TestExternalInterop:
    """Cross-validation against an independent FLAC implementation.

    This image ships neither libFLAC nor ffmpeg, so these tests skip here —
    they exist so any future image with the tools exercises real interop
    (mirrored encoder/decoder bugs are invisible to round-trip tests).
    """

    @staticmethod
    def _tool():
        import shutil

        for name in ("flac", "ffmpeg"):
            if shutil.which(name):
                return name
        return None

    @pytest.fixture
    def tool(self):
        t = self._tool()
        if t is None:
            pytest.skip("no external FLAC implementation (flac/ffmpeg) in image")
        return t

    def test_external_tool_decodes_our_flac(self, tool, tmp_path):
        import subprocess

        rng = np.random.default_rng(11)
        sig = (0.4 * rng.standard_normal((9000, 2))).astype(np.float32)
        ours = str(tmp_path / "ours.flac")
        flacio.write(ours, sig, 22050)
        out_wav = str(tmp_path / "dec.wav")
        if tool == "flac":
            cmd = ["flac", "-d", "-f", "-o", out_wav, ours]
        else:
            cmd = ["ffmpeg", "-y", "-v", "error", "-i", ours,
                   "-acodec", "pcm_s16le", out_wav]
        proc = subprocess.run(cmd, capture_output=True)
        assert proc.returncode == 0, proc.stderr.decode("utf-8", "replace")
        theirs, rate = wavio.read(out_wav)
        assert rate == 22050
        expect = _quantize(sig, 16).astype(np.float32) / 32768.0
        np.testing.assert_allclose(theirs, expect, atol=1.0 / 32768.0)

    def test_we_decode_external_tool_flac(self, tool, tmp_path):
        import subprocess

        rng = np.random.default_rng(12)
        sig = (0.4 * rng.standard_normal((9000, 2))).astype(np.float32)
        src_wav = str(tmp_path / "src.wav")
        wavio.write(src_wav, sig, 22050, subtype="PCM_16")
        theirs_flac = str(tmp_path / "theirs.flac")
        if tool == "flac":
            cmd = ["flac", "-f", "-o", theirs_flac, src_wav]
        else:
            cmd = ["ffmpeg", "-y", "-v", "error", "-i", src_wav, theirs_flac]
        proc = subprocess.run(cmd, capture_output=True)
        assert proc.returncode == 0, proc.stderr.decode("utf-8", "replace")
        decoded, rate = flacio.read(theirs_flac)
        assert rate == 22050
        ref, _ = wavio.read(src_wav)
        np.testing.assert_array_equal(decoded, ref)


def test_write_rejects_oversized_rate(tmp_path):
    """STREAMINFO's rate field is 20 bits — a larger rate must raise, not
    silently mask into a valid file at the wrong pitch (same guard as the
    16-bit blocksize field)."""
    with pytest.raises(ValueError, match="sample rate"):
        flacio.write(tmp_path / "r.flac", np.zeros((16, 1), np.float32), 1 << 20)


def test_id3_prefixed_flac_decodes_via_fallback(tmp_path):
    """Taggers prepend ID3v2 to FLAC too; the MP3 sniff must not make the
    decode terminal — the universal lavc tier reads the real payload."""
    from audio_raytracing_studio_tpu.utils import lavcio, wavio

    if not lavcio.decode_available():
        pytest.skip("FFmpeg libraries not available")
    t = np.arange(9000) / 22050
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None]
    flac_path = tmp_path / "x.flac"
    flacio.write(flac_path, sig, 22050)
    # minimal ID3v2.3 header: 10 bytes + 256 bytes of padding (syncsafe size)
    tag = b"ID3\x03\x00\x00" + b"\x00\x00\x02\x00" + b"\x00" * 256
    tagged = tmp_path / "tagged_flac_file"
    tagged.write_bytes(tag + flac_path.read_bytes())
    data, rate = wavio.read(tagged)
    assert rate == 22050
    assert abs(data.shape[0] - 9000) < 64  # lavc may pad a frame edge
    ref, _ = wavio.read(flac_path)
    n = min(len(ref), len(data))
    np.testing.assert_allclose(data[:n, 0], ref[:n, 0], atol=1e-3)


def test_non_finite_samples_rejected(tmp_path):
    """NaN/Inf float input used to cast to INT64_MIN and crash the
    residual-cost search with a TypeError (found by tools/fuzz_campaign.py
    encode mode) — the error contract demands a clean ValueError."""
    from audio_raytracing_studio_tpu.utils import flacio

    for bad in (np.nan, np.inf, -np.inf):
        x = np.zeros((2048, 2), dtype=np.float32)
        x[17, 0] = bad
        with pytest.raises(ValueError, match="non-finite"):
            flacio.write(tmp_path / "bad.flac", x, 48000)


def test_empty_audio_roundtrip(tmp_path):
    """write() of zero samples produces a legal zero-frame FLAC that read()
    must accept (it used to raise 'contains no audio frames')."""
    from audio_raytracing_studio_tpu.utils import flacio

    p = tmp_path / "empty.flac"
    flacio.write(p, np.zeros((0, 2), np.float32), 48000)
    data, rate = flacio.read(p)
    assert rate == 48000
    assert data.shape == (0, 2)
