"""Device sample-rate conversion (ops/resample.py).

``resample_fft`` is pinned against scipy.signal.resample (the method the
reference applies to external IRs, raytracer_studio.py:1037-1040);
``resample_poly`` is property-tested (tone fidelity, alias suppression,
lengths) and cross-checked against the Fourier method on bandlimited input.
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy import signal

from audio_raytracing_studio_tpu.ops import resample


class TestResampleFFT:
    @pytest.mark.parametrize(
        "n,num",
        [(1000, 441), (1000, 2205), (999, 441), (999, 440), (1000, 440),
         (441, 480), (480, 441), (64, 128), (128, 64), (100, 101)],
    )
    def test_matches_scipy(self, rng, n, num):
        x = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(resample.resample_fft(x, num))
        want = signal.resample(x, num)
        assert got.shape == (num,)
        assert np.abs(got - want).max() < 5e-6 * max(1.0, np.abs(want).max())

    def test_multichannel(self, rng):
        x = rng.standard_normal((500, 3)).astype(np.float32)
        got = np.asarray(resample.resample_fft(x, 750))
        want = signal.resample(x, 750, axis=0)
        assert got.shape == (750, 3)
        assert np.abs(got - want).max() < 5e-6

    def test_identity(self, rng):
        x = rng.standard_normal(321).astype(np.float32)
        assert np.array_equal(np.asarray(resample.resample_fft(x, 321)), x)

    def test_rejects_degenerate(self):
        with pytest.raises(ValueError):
            resample.resample_fft(np.zeros(1, np.float32), 10)
        with pytest.raises(ValueError):
            resample.resample_fft(np.zeros(10, np.float32), 0)


class TestResamplePoly:
    def test_tone_preserved_48k_to_44k1(self):
        rate_in, rate_out = 48000, 44100
        t = np.arange(rate_in // 2) / rate_in  # 0.5 s
        x = (0.5 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
        y = np.asarray(resample.resample_poly(x, rate_out, rate_in))
        assert y.shape[0] == -(-x.shape[0] * 147 // 160)  # ceil(n·L/M)
        # compare mid-section against the ideal resampled tone
        n = y.shape[0]
        ty = np.arange(n) / rate_out
        ideal = 0.5 * np.sin(2 * np.pi * 997.0 * ty)
        mid = slice(n // 4, 3 * n // 4)
        assert np.abs(y[mid] - ideal[mid]).max() < 1e-3

    def test_alias_suppressed(self):
        """A tone above the output Nyquist must (almost) vanish."""
        rate_in, rate_out = 48000, 16000
        t = np.arange(24000) / rate_in
        x = (0.5 * np.sin(2 * np.pi * 11000.0 * t)).astype(np.float32)
        y = np.asarray(resample.resample_poly(x, rate_out, rate_in))
        mid = slice(y.shape[0] // 4, 3 * y.shape[0] // 4)
        assert np.abs(y[mid]).max() < 5e-4  # ≥ ~60 dB down

    def test_matches_fourier_on_bandlimited(self, rng):
        """Both converters agree on in-band content (≈ filter ripple)."""
        rate_in, rate_out = 32000, 48000
        n = 3200
        t = np.arange(n) / rate_in
        x = sum(
            a * np.sin(2 * np.pi * f * t + p)
            for a, f, p in [(0.3, 220.0, 0.1), (0.2, 1000.0, 1.0), (0.1, 3000.0, 2.0)]
        ).astype(np.float32)
        yp = np.asarray(resample.resample_poly(x, rate_out, rate_in))
        yf = np.asarray(resample.resample_fft(x, n * rate_out // rate_in))
        m = min(yp.shape[0], yf.shape[0])
        mid = slice(m // 4, 3 * m // 4)
        assert np.abs(yp[mid] - yf[mid]).max() < 2e-3

    def test_stereo_and_identity(self, rng):
        x = rng.standard_normal((400, 2)).astype(np.float32)
        assert resample.resample_poly(x, 48000, 48000) is not None
        assert np.array_equal(np.asarray(resample.resample_poly(x, 8, 8)), x)
        y = np.asarray(resample.resample_poly(x, 16000, 8000))
        assert y.shape == (800, 2)


class TestAnalyzerIntegration:
    def test_convert_with_samplerate(self, tmp_path, rng):
        from audio_raytracing_studio_tpu.cli.analyzer import convert
        from audio_raytracing_studio_tpu.utils import wavio

        src = tmp_path / "in.wav"
        t = np.arange(16000) / 16000
        wavio.write(src, (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000)
        out = tmp_path / "out.wav"
        convert(str(src), str(out), samplerate=8000)
        data, rate = wavio.read(out)
        assert rate == 8000 and data.shape[0] == 8000
        # the 440 Hz tone survives the conversion
        spec = np.abs(np.fft.rfft(data[:, 0] * np.hanning(len(data))))
        assert spec.argmax() == round(440 * len(data) / 8000)

    def test_convert_flac_with_samplerate(self, tmp_path, rng):
        from audio_raytracing_studio_tpu.cli.analyzer import convert
        from audio_raytracing_studio_tpu.utils import flacio, wavio

        src = tmp_path / "in.wav"
        wavio.write(src, (0.2 * rng.standard_normal(4000)).astype(np.float32), 8000)
        out = tmp_path / "out.flac"
        convert(str(src), str(out), samplerate=16000)
        info = flacio.probe(out)
        assert info["samplerate"] == 16000 and info["frames"] == 8000
