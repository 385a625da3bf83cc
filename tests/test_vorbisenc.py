"""Native Ogg/Vorbis ENCODER tests (utils/vorbisenc.py).

Round-trips through the repo's own decoder (exact sample counts, SNR
floors, the quality ladder), spec-primitive checks (float32 packing, MDCT
perfect reconstruction against the decoder's IMDCT, floor-post residual
encoding vs the decoder's branch logic), and — the same interop
discipline as the FLAC and decoder suites — cross-validation against an
INDEPENDENT Vorbis implementation (SDL_mixer via pygame, present in this
image).

Reference surface: analyser.py:73-83 converts to .ogg via pydub+ffmpeg;
here the target is native.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from audio_raytracing_studio_tpu.utils import vorbisenc, vorbisio


def _test_signal(seconds=2.0, rate=44100, channels=2, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    chans = []
    for c in range(channels):
        chans.append(
            0.5 * np.sin(2 * np.pi * (220 * (c + 1)) * t)
            + 0.1 * np.sin(2 * np.pi * (2500 + 700 * c) * t)
            + 0.02 * rng.standard_normal(len(t))
        )
    return np.stack(chans, axis=1).astype(np.float32), rate


def _snr_db(ref, got):
    err = got.astype(np.float64) - ref.astype(np.float64)
    return 10 * np.log10(
        np.sum(ref.astype(np.float64) ** 2) / max(np.sum(err**2), 1e-30)
    )


class TestPrimitives:
    @pytest.mark.parametrize(
        "v", [0.045, 0.65, 14.0, -7.5 * 0.09, 1.0, 0.2 * 0.225**0.5, 1e-6]
    )
    def test_float32_pack_roundtrip(self, v):
        got = vorbisio.float32_unpack(vorbisenc.float32_pack(v))
        assert got == pytest.approx(v, rel=2e-6)

    def test_float32_pack_zero_and_sign(self):
        assert vorbisio.float32_unpack(vorbisenc.float32_pack(0.0)) == 0.0
        assert vorbisio.float32_unpack(vorbisenc.float32_pack(-1.5)) == -1.5

    def test_bitwriter_matches_bitreader(self):
        w = vorbisenc.BitWriter()
        fields = [(5, 3), (0x564342, 24), (1, 1), (127, 7), (1023, 10)]
        for v, n in fields:
            w.put(v, n)
        r = vorbisio.BitReader(w.bytes())
        for v, n in fields:
            assert r.read(n) == v

    def test_pack_lsb_matches_bitwriter(self):
        rng = np.random.default_rng(3)
        nbits = rng.integers(1, 24, size=200)
        values = rng.integers(0, 1 << 24, size=200) & ((1 << nbits) - 1)
        w = vorbisenc.BitWriter()
        for v, n in zip(values, nbits):
            w.put(int(v), int(n))
        assert vorbisenc._pack_lsb(values, nbits) == w.bytes()

    def test_codewords_stream_order(self):
        # flat-book codeword e must decode back to entry e via the decoder
        w = vorbisenc.BitWriter()
        for e in (0, 1, 77, 127):
            w.put(int(vorbisenc._REV7[e]), 7)
        setup = vorbisenc._own_setup(vorbisenc._book_specs(0.5))
        book = setup.codebooks[4]  # the 7-bit flat floor book
        r = vorbisio.BitReader(w.bytes())
        assert [book.decode(r) for _ in range(4)] == [0, 1, 77, 127]

    def test_mdct_perfect_reconstruction(self):
        # forward MDCT → decoder IMDCT → windowed overlap-add == input
        rng = np.random.default_rng(1)
        m, n = vorbisenc._M, vorbisenc._BLOCKSIZE
        x = rng.standard_normal((1, 6 * m)).astype(np.float64)
        spec = vorbisenc._mdct_frames(x, 5)
        w = vorbisio.vorbis_window(n)
        rec = np.zeros(6 * m)
        for f in range(5):
            rec[f * m : f * m + n] += vorbisio.imdct(spec[f, 0], n) * w
        np.testing.assert_allclose(rec[m : 4 * m], x[0, m : 4 * m], atol=1e-10)

    def test_floor_post_residuals_invert_decoder_branches(self):
        # every (pred, desired) pair must encode to a val the decoder maps
        # back to desired — including the room-boundary branches
        rng_v = vorbisenc._FLOOR_RNG
        for pred in range(0, rng_v, 7):
            for desired in range(0, rng_v, 5):
                if desired == pred:
                    continue  # encoder nudges on-line values; skip
                y = np.zeros((1, 1, vorbisenc._N_POSTS), dtype=np.int64)
                diff = desired - pred
                highroom = rng_v - pred
                lowroom = pred
                room = 2 * min(highroom, lowroom)
                d = abs(diff)
                val_small = 2 * d if diff > 0 else 2 * d - 1
                if val_small < room:
                    val = val_small
                elif highroom > lowroom:
                    val = diff + lowroom
                else:
                    val = highroom + d - 1
                assert 0 < val < rng_v
                # decoder branch replay
                if val >= room:
                    if highroom > lowroom:
                        fy = val - lowroom + pred
                    else:
                        fy = pred - (val - highroom) - 1
                elif val & 1:
                    fy = pred - ((val + 1) >> 1)
                else:
                    fy = pred + (val >> 1)
                assert fy == desired, (pred, desired, val, fy)


class TestRoundTrip:
    def test_stereo_exact_length_and_snr(self):
        x, rate = _test_signal()
        buf = io.BytesIO()
        vorbisenc.encode(x, rate, buf)
        dec, r = vorbisio.decode(io.BytesIO(buf.getvalue()))
        assert r == rate
        assert dec.shape == x.shape
        assert _snr_db(x, dec) > 28.0

    def test_quality_ladder(self):
        x, rate = _test_signal(seconds=1.0)
        sizes, snrs = [], []
        for q in (0.0, 0.5, 1.0):
            buf = io.BytesIO()
            vorbisenc.encode(x, rate, buf, quality=q)
            dec, _ = vorbisio.decode(io.BytesIO(buf.getvalue()))
            sizes.append(len(buf.getvalue()))
            snrs.append(_snr_db(x, dec))
        assert snrs[0] < snrs[1] < snrs[2]
        assert sizes[0] < sizes[2]
        assert snrs[2] > 35.0

    @pytest.mark.parametrize("channels", [1, 6])
    def test_channel_counts(self, channels):
        x, rate = _test_signal(seconds=0.7, channels=channels)
        buf = io.BytesIO()
        vorbisenc.encode(x, rate, buf)
        dec, r = vorbisio.decode(io.BytesIO(buf.getvalue()))
        assert dec.shape == x.shape
        assert _snr_db(x, dec) > 25.0

    def test_short_clip_under_one_frame(self):
        rng = np.random.default_rng(5)
        x = (0.3 * rng.standard_normal((500, 2))).astype(np.float32)
        buf = io.BytesIO()
        vorbisenc.encode(x, 8000, buf)
        dec, r = vorbisio.decode(io.BytesIO(buf.getvalue()))
        assert dec.shape == (500, 2)
        assert r == 8000

    def test_silence(self):
        x = np.zeros((5000, 2), dtype=np.float32)
        buf = io.BytesIO()
        vorbisenc.encode(x, 48000, buf)
        dec, _ = vorbisio.decode(io.BytesIO(buf.getvalue()))
        assert dec.shape == x.shape
        assert np.max(np.abs(dec)) < 1e-4

    def test_mono_1d_input(self):
        x = (0.5 * np.sin(2 * np.pi * 330 * np.arange(9000) / 22050)).astype(
            np.float32
        )
        buf = io.BytesIO()
        vorbisenc.encode(x, 22050, buf)
        dec, r = vorbisio.decode(io.BytesIO(buf.getvalue()))
        assert dec.shape == (9000, 1)
        assert _snr_db(x[:, None], dec) > 25.0

    def test_probe_metadata(self, tmp_path):
        x, rate = _test_signal(seconds=0.5)
        p = tmp_path / "probe.ogg"
        vorbisenc.write(p, x, rate)
        meta = vorbisio.probe(p)
        assert meta["samplerate"] == rate
        assert meta["channels"] == 2
        assert meta["frames"] == len(x)

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="channel count"):
            vorbisenc.encode(np.zeros((10, 9), dtype=np.float32), 48000, io.BytesIO())
        with pytest.raises(ValueError, match="rate"):
            vorbisenc.encode(np.zeros((10, 2), dtype=np.float32), 0, io.BytesIO())
        with pytest.raises(ValueError, match="quality"):
            vorbisenc.encode(
                np.zeros((10, 2), dtype=np.float32), 48000, io.BytesIO(), quality=2.0
            )

    def test_ogg_pages_crc_valid(self):
        x, rate = _test_signal(seconds=0.5)
        buf = io.BytesIO()
        vorbisenc.encode(x, rate, buf)
        data = buf.getvalue()
        # the decoder's page layer CRC-checks every page; a bit flip in a
        # body must be detected (skipped page → different/failed decode)
        ref, _ = vorbisio.decode(io.BytesIO(data))
        corrupt = bytearray(data)
        corrupt[len(data) // 2] ^= 0x40
        try:
            got, _ = vorbisio.decode(io.BytesIO(bytes(corrupt)))
            assert got.shape != ref.shape or not np.array_equal(got, ref)
        except ValueError:
            pass  # fully rejected is fine too


class TestInterop:
    def test_sdl_mixer_decodes_our_stream(self, tmp_path):
        """An independent Vorbis implementation must accept our stream."""
        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        pygame = pytest.importorskip("pygame")
        x, rate = _test_signal(seconds=1.5)
        p = tmp_path / "ours.ogg"
        vorbisenc.write(p, x, rate)
        pygame.mixer.quit()
        pygame.mixer.init(frequency=rate, size=-16, channels=2)
        raw = np.frombuffer(pygame.mixer.Sound(str(p)).get_raw(), dtype="<i2")
        got = raw.astype(np.float32).reshape(-1, 2) / 32768.0
        assert got.shape == x.shape  # exact sample count through SDL too
        # int16 quantization + lossy coding: correlation is the right bar
        c = np.corrcoef(got.ravel(), x.ravel())[0, 1]
        assert c > 0.995

    def test_ffmpeg_decodes_our_stream(self, tmp_path):
        """Tool-gated: where ffmpeg exists, it must accept our stream."""
        import shutil

        if shutil.which("ffmpeg") is None:
            pytest.skip("no ffmpeg in image")
        x, rate = _test_signal(seconds=1.0)
        p = tmp_path / "ours.ogg"
        vorbisenc.write(p, x, rate)
        out = tmp_path / "back.wav"
        subprocess.run(
            ["ffmpeg", "-y", "-v", "error", "-i", str(p), str(out)], check=True
        )
        from audio_raytracing_studio_tpu.utils import wavio

        got, r = wavio.read(str(out))
        assert r == rate
        assert abs(got.shape[0] - x.shape[0]) <= 1024


class TestProductSurface:
    def test_analyzer_convert_to_ogg(self, tmp_path):
        from audio_raytracing_studio_tpu.cli import analyzer
        from audio_raytracing_studio_tpu.utils import wavio

        x, rate = _test_signal(seconds=0.6)
        src = tmp_path / "in.wav"
        wavio.write(src, x, rate)
        dst = tmp_path / "out.ogg"
        analyzer.convert(str(src), str(dst))
        dec, r = vorbisio.decode(dst)
        assert r == rate
        assert dec.shape[0] == x.shape[0]

    def test_write_audio_dispatches_ogg(self, tmp_path):
        from audio_raytracing_studio_tpu.utils import wavio

        x, rate = _test_signal(seconds=0.4)
        p = tmp_path / "w.ogg"
        wavio.write_audio(p, x, rate)
        dec, r = wavio.read(p)  # sniff chain routes back through vorbisio
        assert r == rate
        assert dec.shape == x.shape


def test_non_finite_samples_rejected(tmp_path):
    """A single NaN/Inf sample used to ride the MDCT into the floor
    quantizer where the int64 cast of NaN indexes out of bounds
    (IndexError, found by tools/fuzz_campaign.py encode mode) — the
    error contract demands a clean ValueError."""
    for bad in (np.nan, np.inf, -np.inf):
        x = np.zeros((4096, 2), dtype=np.float32)
        x[7, 1] = bad
        with pytest.raises(ValueError, match="non-finite"):
            vorbisenc.encode(x, 44100, tmp_path / "bad.ogg")


def test_bitrate_maps_to_quality(tmp_path):
    """The analyzer's --bitrate request must change the .ogg encoding
    (the encoder is quality-mode; the mapping makes the knob real)."""
    from audio_raytracing_studio_tpu.utils import vorbisenc, vorbisio

    assert vorbisenc.quality_for_bitrate(64) == 0.0
    assert vorbisenc.quality_for_bitrate(320) == 1.0
    assert 0.0 < vorbisenc.quality_for_bitrate(160) < 1.0

    rng = np.random.default_rng(3)
    t = np.arange(11025) / 11025
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    lo = tmp_path / "lo.ogg"
    hi = tmp_path / "hi.ogg"
    vorbisenc.write(lo, x, 11025, quality=vorbisenc.quality_for_bitrate(64))
    vorbisenc.write(hi, x, 11025, quality=vorbisenc.quality_for_bitrate(320))
    assert hi.stat().st_size > lo.stat().st_size  # more bits at higher quality
    for p in (lo, hi):  # both stay decodable
        out, rate = vorbisio.decode(str(p))
        assert rate == 11025 and out.shape[0] > 0
