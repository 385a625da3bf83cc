"""AAC/M4A I/O through the FFmpeg libraries (utils/lavcio + the compiled
shim utils/_native/lavc_shim.cc — no ffmpeg binary, no subprocess).

Closes the last conversion gap vs the reference: analyser.py:73-83 converts
to aac via pydub → ffmpeg BINARY; raytracer_studio.py:1013 reads m4a the
same way.  Here both directions bind the in-image FFmpeg 5.1 libraries.

Interop caveat: encode and decode both go through libavcodec, so round
trips alone cannot prove spec compliance.  TestSpecCompliance therefore
parses the emitted ADTS frame headers and MP4 box structure against the
specs by hand (the known-answer discipline of the FLAC/Vorbis suites).
"""

import os
import struct

import numpy as np
import pytest

from audio_raytracing_studio_tpu.utils import lavcio, wavio

needs_lavc = pytest.mark.skipif(
    not lavcio.decode_available(),
    reason="FFmpeg libraries not present in this image",
)


def _test_signal(seconds=1.0, rate=48000, channels=2, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    chans = []
    for c in range(channels):
        chans.append(
            0.5 * np.sin(2 * np.pi * (440 * (c + 1)) * t)
            + 0.08 * np.sin(2 * np.pi * (2300 + 700 * c) * t)
            + 0.005 * rng.standard_normal(len(t))
        )
    return np.stack(chans, axis=1).astype(np.float32), rate


def _aligned_snr_db(ref, got, max_lag=4096):
    """SNR over the overlap at the best alignment (AAC has codec delay:
    MP4 trims the priming via its edit list, raw ADTS cannot)."""
    a = ref[:, 0].astype(np.float64)
    b = got[:, 0].astype(np.float64)
    n = min(len(a), len(b)) - max_lag
    corr = [float(np.dot(a[:n], b[lag : lag + n])) for lag in range(max_lag)]
    lag = int(np.argmax(corr))
    n_all = min(len(ref), len(got) - lag)
    err = got[lag : lag + n_all].astype(np.float64) - ref[:n_all].astype(np.float64)
    sig = np.sum(ref[:n_all].astype(np.float64) ** 2)
    return 10 * np.log10(sig / max(np.sum(err**2), 1e-30)), lag


@needs_lavc
class TestRoundTrip:
    def test_stereo_m4a(self, tmp_path):
        """MP4 carries the priming in its edit list, so decode starts at
        sample 0 (lag 0) and the length lands within one AAC frame."""
        sig, rate = _test_signal()
        path = str(tmp_path / "clip.m4a")
        lavcio.encode_aac(path, sig, rate, bitrate_kbps=192)
        dec, r = lavcio.decode(path)
        assert r == rate and dec.shape[1] == 2
        assert len(sig) <= len(dec) <= len(sig) + 1024
        snr, lag = _aligned_snr_db(sig, dec)
        assert lag == 0
        assert snr > 15.0, f"SNR {snr:.1f} dB"

    def test_mono_adts(self, tmp_path):
        """Raw ADTS has no container metadata: the decoder cannot trim the
        encoder's 1024-sample priming, so the signal appears at lag 1024."""
        sig, rate = _test_signal(channels=1)
        path = str(tmp_path / "clip.aac")
        lavcio.encode_aac(path, sig, rate, bitrate_kbps=128)
        dec, r = lavcio.decode(path)
        assert r == rate and dec.shape[1] == 1
        snr, lag = _aligned_snr_db(sig, dec)
        assert lag == 1024
        assert snr > 15.0, f"SNR {snr:.1f} dB"

    def test_sine_frequency_known_answer(self, tmp_path):
        """A pure 440 Hz sine must come back with its spectral peak at
        440 Hz — catches any codec-level rate confusion a round trip
        through the same library would mirror away."""
        rate = 44100
        t = np.arange(rate) / rate
        sig = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "sine.m4a")
        lavcio.encode_aac(path, sig, rate)
        dec, r = lavcio.decode(path)
        spec = np.abs(np.fft.rfft(dec[: len(t), 0]))
        peak_hz = np.argmax(spec) * r / len(t)
        assert abs(peak_hz - 440.0) < 2.0

    def test_unsupported_rate_rejected(self, tmp_path):
        sig, _ = _test_signal(seconds=0.1)
        with pytest.raises(ValueError, match="[Ss]ample rate"):
            lavcio.encode_aac(str(tmp_path / "x.aac"), sig, 12345)


@needs_lavc
class TestProbe:
    def test_m4a_probe(self, tmp_path):
        sig, rate = _test_signal(seconds=2.0)
        path = str(tmp_path / "clip.m4a")
        lavcio.encode_aac(path, sig, rate)
        info = lavcio.probe(path)
        assert info["samplerate"] == rate
        assert info["channels"] == 2
        assert abs(info["duration"] - 2.0) < 0.1
        assert info["bits"] == 0


@needs_lavc
class TestWavioWiring:
    def test_read_m4a_and_aac(self, tmp_path):
        sig, rate = _test_signal()
        for ext in ("clip.m4a", "clip.aac"):
            path = str(tmp_path / ext)
            lavcio.encode_aac(path, sig, rate)
            data, r = wavio.read(path)
            assert r == rate and data.shape[1] == 2
            assert len(data) >= len(sig)

    def test_write_audio_dispatch(self, tmp_path):
        sig, rate = _test_signal(channels=1)
        path = str(tmp_path / "out.m4a")
        wavio.write_audio(path, sig, rate)
        data, r = wavio.read(path)
        assert r == rate and len(data) >= len(sig)

    def test_probe_m4a(self, tmp_path):
        sig, rate = _test_signal()
        path = str(tmp_path / "clip.m4a")
        lavcio.encode_aac(path, sig, rate)
        info = wavio.probe(path)
        assert info["samplerate"] == rate and info["channels"] == 2

    def test_sniff(self):
        # ADTS sync with MPEG-4 framing → AAC; ftyp box → MP4/M4A
        assert wavio.sniff_container(b"\xff\xf1\x50\x80" + b"\0" * 8) == "AAC"
        assert (
            wavio.sniff_container(b"\x00\x00\x00\x20ftypM4A \x00\x00\x02\x00")
            == "MP4/M4A"
        )

    def test_truncated_m4a_clean_error(self, tmp_path):
        sig, rate = _test_signal()
        path = str(tmp_path / "clip.m4a")
        lavcio.encode_aac(path, sig, rate)
        blob = open(path, "rb").read()
        bad = str(tmp_path / "bad.m4a")
        with open(bad, "wb") as fh:
            fh.write(blob[: len(blob) // 8])
        with pytest.raises(ValueError, match="beschädigt|nicht dekodierbar"):
            wavio.read(bad)

    def test_garbage_ftyp_clean_error(self, tmp_path):
        bad = str(tmp_path / "junk.mp4")
        with open(bad, "wb") as fh:
            fh.write(b"\x00\x00\x00\x20ftypM4A " + os.urandom(64))
        with pytest.raises(ValueError):
            wavio.read(bad)


@needs_lavc
class TestAnalyzerConvert:
    def test_wav_to_aac_and_back(self, tmp_path):
        from audio_raytracing_studio_tpu.cli.analyzer import convert

        sig, rate = _test_signal()
        src = str(tmp_path / "in.wav")
        wavio.write(src, sig, rate)
        out = convert(src, str(tmp_path / "out.m4a"), bitrate="160")
        assert os.path.getsize(out) > 1000
        back = convert(out, str(tmp_path / "back.flac"))
        data, r = wavio.read(back)
        assert r == rate and data.shape[1] == 2


@needs_lavc
class TestSpecCompliance:
    """Hand-parse the emitted bytes against the container specs — the
    cross-check a libavcodec round trip cannot provide."""

    _ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                   16000, 12000, 11025, 8000, 7350]

    def test_adts_framing(self, tmp_path):
        sig, rate = _test_signal(channels=1)
        path = str(tmp_path / "clip.aac")
        lavcio.encode_aac(path, sig, rate, bitrate_kbps=128)
        blob = open(path, "rb").read()
        pos, frames = 0, 0
        while pos < len(blob):
            assert len(blob) - pos >= 7, "truncated final ADTS header"
            h = blob[pos : pos + 7]
            # syncword: 12 set bits; MPEG-4 ID bit 0; layer 00
            assert h[0] == 0xFF and (h[1] & 0xF0) == 0xF0
            assert (h[1] & 0x06) == 0, "layer bits must be 00"
            profile = (h[2] >> 6) & 0x3
            assert profile == 1, "expected AAC-LC (profile bits 01)"
            sr_index = (h[2] >> 2) & 0xF
            assert self._ADTS_RATES[sr_index] == rate
            chan_cfg = ((h[2] & 0x1) << 2) | ((h[3] >> 6) & 0x3)
            assert chan_cfg == 1  # mono
            frame_len = ((h[3] & 0x03) << 11) | (h[4] << 3) | ((h[5] >> 5) & 0x7)
            assert 7 <= frame_len <= len(blob) - pos
            pos += frame_len
            frames += 1
        assert pos == len(blob), "frame lengths must tile the file exactly"
        # 1.0 s @ 48 kHz → ceil((48000 + 1024 priming)/1024) = 48 frames,
        # plus up to 2 flush frames
        assert 48 <= frames <= 50

    def test_mp4_box_structure(self, tmp_path):
        sig, rate = _test_signal()
        path = str(tmp_path / "clip.m4a")
        lavcio.encode_aac(path, sig, rate)
        blob = open(path, "rb").read()
        boxes = {}
        pos = 0
        while pos + 8 <= len(blob):
            size, kind = struct.unpack(">I4s", blob[pos : pos + 8])
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", blob[pos + 8 : pos + 16])[0]
            assert size >= 8 and pos + size <= len(blob), "box overruns file"
            boxes[kind] = size
            pos += size
        assert pos == len(blob), "boxes must tile the file exactly"
        assert b"ftyp" in boxes and b"moov" in boxes and b"mdat" in boxes
