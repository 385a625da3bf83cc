"""Native Ogg/Vorbis decoder tests (utils/vorbisio.py).

Component-level spec checks (codeword assignment, floor line rendering,
IMDCT, window complementarity), corruption detection (Ogg CRC), and —
the interop discipline ADVICE r2 asked of codecs — cross-validation of a
real libvorbis-encoded stream against an INDEPENDENT decoder (SDL_mixer
via pygame, present in this image) to int16-quantization accuracy.

Reference surface: raytracer_studio.py:1013 reads .ogg via soundfile.
"""

import io
import os

import numpy as np
import pytest

from audio_raytracing_studio_tpu.utils import vorbisio, wavio

OGG_FIXTURE = (
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
)


def _pygame_reference(path, rate, channels):
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame = pytest.importorskip("pygame")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    raw = np.frombuffer(pygame.mixer.Sound(path).get_raw(), dtype="<i2")
    return raw.astype(np.float32) / 32768.0


class TestPrimitives:
    def test_ilog(self):
        assert [vorbisio.ilog(x) for x in (0, 1, 2, 3, 4, 7, 8)] == [
            0, 1, 2, 2, 3, 3, 4,
        ]

    def test_float32_unpack(self):
        # value = mantissa · 2^(exp−788), sign bit 31  (spec 9.2.2)
        assert vorbisio.float32_unpack((788 << 21) | 1) == 1.0
        assert vorbisio.float32_unpack((790 << 21) | 3) == 12.0
        assert vorbisio.float32_unpack(0x80000000 | (788 << 21) | 5) == -5.0

    def test_lookup1_values(self):
        assert vorbisio.lookup1_values(8, 3) == 2
        assert vorbisio.lookup1_values(26, 3) == 2
        assert vorbisio.lookup1_values(27, 3) == 3
        assert vorbisio.lookup1_values(100, 2) == 10

    def test_codeword_assignment_canonical(self):
        lengths = [2, 4, 4, 4, 4, 2, 3, 3]
        codes = vorbisio._assign_codewords(lengths)
        # spec 3.2.1 worked example
        assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111, 0b10,
                         0b110, 0b111]

    def test_codeword_assignment_prefix_free(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            # random Kraft-satisfying length multiset
            lengths = sorted(rng.integers(1, 9, size=6).tolist())
            kraft = sum(2.0 ** -l for l in lengths)
            if kraft > 1.0:
                continue
            codes = vorbisio._assign_codewords(lengths)
            seen = [(l, c) for l, c in zip(lengths, codes)]
            for i, (li, ci) in enumerate(seen):
                for j, (lj, cj) in enumerate(seen):
                    if i == j:
                        continue
                    m = min(li, lj)
                    assert (ci >> (li - m)) != (cj >> (lj - m)), (
                        f"prefix collision {seen}"
                    )

    def test_render_point_and_line(self):
        assert vorbisio._render_point(0, 0, 10, 10, 5) == 5
        assert vorbisio._render_point(0, 10, 10, 0, 5) == 5
        v = np.zeros(10, dtype=np.int64)
        vorbisio._render_line(0, 0, 9, 9, v, 10)
        np.testing.assert_array_equal(v[:9], np.arange(9))

    @pytest.mark.parametrize("n", [64, 256, 2048])
    def test_imdct_fast_matches_direct(self, n):
        rng = np.random.default_rng(n)
        x = rng.standard_normal(n // 2)
        fast = vorbisio.imdct(x, n)
        slow = vorbisio._imdct_slow(x, n)
        np.testing.assert_allclose(fast, slow, atol=1e-9 * max(1, np.abs(slow).max()))

    def test_window_power_complementary(self):
        """Adjacent equal-size windows must OLA to unity (perfect
        reconstruction condition for the Vorbis window)."""
        n = 512
        w = vorbisio._build_window(n, True, 1, 1, n)
        lap = w[n // 2 :] ** 2 + w[: n // 2] ** 2
        np.testing.assert_allclose(lap, 1.0, atol=1e-12)

    def test_window_transition_geometry(self):
        """Long block between short neighbours: slopes sit centered on the
        quarter points with short-window length (spec 4.3.1)."""
        n, s = 2048, 256
        w = vorbisio._build_window(n, True, 0, 0, s)
        ls = n // 4 - s // 4
        assert np.all(w[:ls] == 0.0)
        assert np.all(w[n // 4 + s // 4 : 3 * n // 4 - s // 4] == 1.0)
        assert np.all(w[3 * n // 4 + s // 4 :] == 0.0)


class TestOggLayer:
    def test_crc_detects_corruption(self):
        raw = bytearray(open(OGG_FIXTURE, "rb").read())
        raw[100] ^= 0x01  # flip a bit inside the first page body
        with pytest.raises(ValueError, match="CRC"):
            vorbisio.decode(io.BytesIO(bytes(raw)))

    def test_not_ogg(self):
        with pytest.raises(ValueError, match="Ogg"):
            vorbisio.decode(io.BytesIO(b"RIFFxxxxWAVE" + b"\x00" * 40))

    def test_opus_detected(self):
        """An Opus-in-Ogg stream gets a specific, actionable error."""
        import struct

        body = b"OpusHead" + b"\x01" + b"\x02" + b"\x00" * 9
        segs = bytes([len(body)])
        head = b"OggS" + b"\x00" + b"\x02" + struct.pack("<q", 0)
        head += struct.pack("<I", 1) + struct.pack("<I", 0)
        page_wo_crc = head + b"\x00\x00\x00\x00" + bytes([1]) + segs + body
        crc = vorbisio.ogg_crc(page_wo_crc)
        page = page_wo_crc[:22] + struct.pack("<I", crc) + page_wo_crc[26:]
        with pytest.raises(ValueError, match="Opus"):
            vorbisio.decode(io.BytesIO(page))

    def test_non_vorbis_payload_is_unsupported_codec(self):
        """A legal Ogg container with a non-Vorbis payload (Speex, Ogg/FLAC …)
        must raise UnsupportedCodec so wavio can fall through to the
        universal decode tier instead of reporting corruption."""
        import struct

        def bos_page(body):
            segs = bytes([len(body)])
            head = b"OggS" + b"\x00" + b"\x02" + struct.pack("<q", 0)
            head += struct.pack("<I", 1) + struct.pack("<I", 0)
            page_wo_crc = head + b"\x00\x00\x00\x00" + bytes([1]) + segs + body
            crc = vorbisio.ogg_crc(page_wo_crc)
            return page_wo_crc[:22] + struct.pack("<I", crc) + page_wo_crc[26:]

        assert issubclass(vorbisio.UnsupportedCodec, ValueError)  # back-compat
        for payload in (b"Speex   " + b"\x00" * 20, b"\x7fFLAC\x01\x00" + b"\x00" * 24):
            with pytest.raises(vorbisio.UnsupportedCodec):
                vorbisio.decode(io.BytesIO(bos_page(payload)))
        with pytest.raises(vorbisio.UnsupportedCodec, match="Opus"):
            vorbisio.decode(io.BytesIO(bos_page(b"OpusHead" + b"\x01\x02" + b"\x00" * 9)))
        # truly corrupt streams stay plain ValueError, NOT UnsupportedCodec
        raw = bytearray(open(OGG_FIXTURE, "rb").read())
        raw[100] ^= 0x01
        with pytest.raises(ValueError) as ei:
            vorbisio.decode(io.BytesIO(bytes(raw)))
        assert not isinstance(ei.value, vorbisio.UnsupportedCodec)

    def test_packet_granules_honor_completion_contract(self):
        """Per-packet granule is the page granule only for the packet that
        completes LAST on the page; earlier packets carry −1."""
        raw = open(OGG_FIXTURE, "rb").read()
        packets, final_granule = vorbisio._ogg_packets(raw)
        grans = [g for _, g in packets]
        assert final_granule > 0
        assert final_granule in grans
        assert -1 in grans  # multi-packet pages exist in the fixture
        # every non-negative granule is nondecreasing in stream order
        nn = [g for g in grans if g >= 0]
        assert nn == sorted(nn)

    def test_truncation_fuzz_never_hangs(self):
        raw = open(OGG_FIXTURE, "rb").read()
        rng = np.random.default_rng(5)
        for cut in rng.integers(10, len(raw), size=8):
            try:
                out, _ = vorbisio.decode(io.BytesIO(raw[: int(cut)]))
                assert out.shape[0] >= 0  # partial decode is acceptable
            except (ValueError, EOFError):
                pass  # clean error is acceptable


class TestRealStream:
    def test_decode_matches_independent_decoder(self):
        """The full libvorbis-encoded fixture vs SDL_mixer, sample-exact to
        int16 quantization (float output is clipped like SDL's int16)."""
        ours, rate = vorbisio.decode(OGG_FIXTURE)
        assert rate == 11025
        assert ours.shape[1] == 1
        ref = _pygame_reference(OGG_FIXTURE, 11025, 1)
        assert ours.shape[0] == ref.shape[0]  # exact granule-trimmed length
        clipped = np.clip(ours[:, 0], -1.0, 32767.0 / 32768.0)
        err = np.abs(clipped - ref)
        assert err.max() < 5e-4  # a few int16 LSBs
        assert np.sqrt(np.mean(err**2)) < 5e-5

    def test_probe(self):
        meta = vorbisio.probe(OGG_FIXTURE)
        assert meta["samplerate"] == 11025
        assert meta["channels"] == 1
        assert meta["frames"] == 78331
        assert meta["format"] == "OGG/Vorbis"


class TestRobustness:
    def test_deep_parse_errors_become_valueerror(self, monkeypatch, tmp_path):
        """Malformed setup data can surface as IndexError/ZeroDivisionError/
        EOFError deep in the parser; the public decode() contract is
        ValueError (wavio maps it to the user-facing corruption message)."""
        for exc in (IndexError("book 200"), ZeroDivisionError(), EOFError("x")):
            def boom(_pf, _e=exc):
                raise _e

            monkeypatch.setattr(vorbisio, "_decode_impl", boom)
            with pytest.raises(ValueError, match="corrupt Ogg/Vorbis"):
                vorbisio.decode(OGG_FIXTURE)
            monkeypatch.undo()

    def test_probe_windowed_matches_decode(self, tmp_path):
        """A file larger than both probe windows takes the head+tail path:
        frames must still equal the exact decoded length (render_dir trusts
        it for bucketing AND trimming)."""
        from audio_raytracing_studio_tpu.utils import vorbisenc

        rng = np.random.default_rng(5)
        sig = (0.4 * rng.standard_normal(int(8000 * 40))).astype(np.float32)
        p = tmp_path / "big.ogg"
        vorbisenc.write(p, sig, 8000)
        assert p.stat().st_size > 2 * vorbisio._PROBE_WINDOW, (
            "fixture too small to exercise the windowed path"
        )
        meta = vorbisio.probe(p)
        decoded, rate = vorbisio.decode(p)
        assert meta["samplerate"] == rate == 8000
        assert meta["frames"] == decoded.shape[0]
        assert meta["duration"] == pytest.approx(decoded.shape[0] / 8000)


class TestIntegration:
    def test_wavio_reads_ogg(self):
        data, rate = wavio.read(OGG_FIXTURE)
        assert rate == 11025
        assert data.shape == (78331, 1)
        assert np.abs(data).max() > 0.5

    def test_non_vorbis_ogg_falls_through_tiers(self, tmp_path):
        """wavio.read of a legal-but-non-Vorbis Ogg must try the later decode
        tiers, not stop with a misleading 'OGG-Datei beschädigt' error."""
        import struct

        body = b"Speex   " + b"\x00" * 20
        segs = bytes([len(body)])
        head = b"OggS" + b"\x00" + b"\x02" + struct.pack("<q", 0)
        head += struct.pack("<I", 1) + struct.pack("<I", 0)
        page_wo_crc = head + b"\x00\x00\x00\x00" + bytes([1]) + segs + body
        crc = vorbisio.ogg_crc(page_wo_crc)
        page = page_wo_crc[:22] + struct.pack("<I", crc) + page_wo_crc[26:]
        p = tmp_path / "speex.ogg"
        p.write_bytes(page)
        # the fake Speex page is not decodable by ANY tier here; the point is
        # the error comes from the tier chain (install hint / decode failure),
        # never the Vorbis-corruption contract
        with pytest.raises(ValueError) as ei:
            wavio.read(p)
        assert "beschädigt" not in str(ei.value)

    def test_wavio_probe_ogg(self):
        meta = wavio.probe(OGG_FIXTURE)
        assert meta["samplerate"] == 11025
        assert meta["frames"] == 78331

    def test_render_pipeline_accepts_ogg(self):
        """The reference accepts .ogg uploads (raytracer_studio.py:1013);
        the full orchestrator path must render one natively."""
        from audio_raytracing_studio_tpu.app import api

        player, download, metrics = api.apply_raytrace_convolution_3d(
            OGG_FIXTURE, None, False, "Room", 80.0, 0.5, 0.2, 0.8, 0.6,
            0.5, 0.8, 1.0, 1.0, 0.5, 0.5, 0.5, "Holz", "Stereo", seed=4,
        )
        assert download is not None and os.path.exists(download)
        assert "LUFS" in metrics
        out, out_rate = wavio.read(download)
        assert out_rate == 11025
        assert out.shape[0] > 78331  # reverb tail appended

    def test_analyzer_ogg_input(self, tmp_path):
        from audio_raytracing_studio_tpu.cli import analyzer

        info = analyzer.analyze(OGG_FIXTURE)
        assert info["Abtastrate"] == 11025
        out = tmp_path / "from_ogg.flac"
        analyzer.convert(OGG_FIXTURE, str(out))
        d, r = wavio.read(out)
        assert r == 11025 and d.shape[0] == 78331


class TestChannelOrder:
    """Vorbis I §4.3.9 fixes the multichannel wire order (5.1 = L C R RL RR
    LFE); the product convention is WAV order (config.CHANNEL_LAYOUTS).
    vorbisenc permutes WAV→spec on encode and decode() inverts it, so repo
    round trips are identity AND the wire bytes are spec-ordered — which
    libavcodec (an independent implementation) must agree with."""

    @staticmethod
    def _signatures(channels, seconds=1.5, rate=44100):
        rng = np.random.default_rng(0x0C0 + channels)
        n = int(seconds * rate)
        return np.stack(
            [0.2 * rng.standard_normal(n) for _ in range(channels)], axis=1
        ).astype(np.float32)

    def test_tables_are_inverses(self):
        for ch, perm in vorbisio.WAV_FROM_VORBIS.items():
            inv = vorbisio.VORBIS_FROM_WAV[ch]
            assert sorted(perm) == list(range(ch))
            assert [perm[inv[j]] for j in range(ch)] == list(range(ch))

    @pytest.mark.parametrize("channels", [3, 4, 5, 6, 7, 8])
    def test_round_trip_channel_identity(self, channels, tmp_path):
        from audio_raytracing_studio_tpu.utils import vorbisenc

        data = self._signatures(channels)
        path = tmp_path / f"order{channels}.ogg"
        vorbisenc.write(path, data, 44100)
        out = np.asarray(vorbisio.decode(path)[0])
        n = min(len(out), len(data))
        for k in range(channels):
            cors = [
                abs(np.corrcoef(out[:n, k], data[:n, j])[0, 1])
                for j in range(channels)
            ]
            assert int(np.argmax(cors)) == k, f"decoded ch{k} -> src {cors}"
            assert max(cors) > 0.9

    @pytest.mark.parametrize("channels", [3, 4, 6, 8])
    def test_libavcodec_agrees_channel_for_channel(self, channels, tmp_path):
        """Independent-decoder check of the wire order, and the regression
        pin for the lavc_shim downmix bug: requesting the default layout
        for 3ch (2.1) / 4ch (4.0) folded the center/backs and zeroed a
        column — every decoded channel must be live and match its source."""
        from audio_raytracing_studio_tpu.utils import lavcio, vorbisenc

        if not lavcio.decode_available():
            pytest.skip("FFmpeg libraries not present")
        data = self._signatures(channels)
        path = tmp_path / f"lavc{channels}.ogg"
        vorbisenc.write(path, data, 44100)
        out, rate = lavcio.decode(path)
        assert rate == 44100 and out.shape[1] == channels
        n = min(len(out), len(data))
        for k in range(channels):
            assert float(np.std(out[:n, k])) > 0.01, f"ch{k} zeroed (downmix)"
            cors = [
                abs(np.corrcoef(out[:n, k], data[:n, j])[0, 1])
                for j in range(channels)
            ]
            assert int(np.argmax(cors)) == k and max(cors) > 0.9
