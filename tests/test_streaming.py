"""Single-device streaming long render vs the single-shot pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracing_studio_tpu.models import pipeline
from audio_raytracing_studio_tpu.parallel import streaming
from audio_raytracing_studio_tpu.params import RenderParams


def clip(rng, seconds, rate):
    t = np.arange(int(seconds * rate)) / rate
    return (0.4 * np.sin(2 * np.pi * 330 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


class TestStreaming:
    def test_matches_single_shot(self, rng):
        rate = 16000
        x = clip(rng, 2.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.0)
        out = streaming.render_streaming(x, rate, p, seed=3, chunk_seconds=0.4)
        single = pipeline.render(x, rate, p, seed=3)
        assert out.shape == single.shape
        assert np.max(np.abs(out - single)) < 2e-4

    def test_chunk_size_invariance(self, rng):
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0)
        a = streaming.render_streaming(x, rate, p, seed=1, chunk_seconds=0.3)
        b = streaming.render_streaming(x, rate, p, seed=1, chunk_seconds=1.1)
        assert np.max(np.abs(a - b)) < 1e-5  # overlap-add is exact

    def test_air_and_layout(self, rng):
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="7.1 (Surround)", room_size=60.0,
                         air_absorption=0.6, z_pos=0.7)
        out = streaming.render_streaming(x, rate, p, seed=2, chunk_seconds=0.5)
        exact = pipeline.render(x, rate, p, seed=2, fast_filters=False)
        assert out.shape == exact.shape
        assert np.max(np.abs(out - exact)) < 1e-3  # fast_air contract

    def test_external_ir(self, rng):
        rate = 16000
        x = clip(rng, 1.0, rate)
        ir = (rng.standard_normal((700, 2)) * 0.2).astype(np.float32)
        p = RenderParams(use_external_ir=True, target_layout="Stereo", dry_wet=0.7)
        out = streaming.render_streaming(x, rate, p, external_ir=ir, chunk_seconds=0.3)
        single = pipeline.render(x, rate, p, external_ir=ir)
        assert out.shape == single.shape
        assert np.max(np.abs(out - single)) < 2e-4

    def test_eq_streaming_matches_single_shot(self, rng):
        """Round-3 VERDICT item 2: non-unity gains render in streaming mode
        via the blockwise exact-length EQ and match the single-shot exact
        pipeline within the fast_air envelope."""
        rate = 16000
        x = clip(rng, 0.9, rate)
        p = RenderParams(target_layout="Stereo", bass_gain=2.0, treble_gain=0.6)
        out = streaming.render_streaming(x, rate, p, seed=3, chunk_seconds=0.21)
        single = pipeline.render(x, rate, p, seed=3)
        assert out.shape == single.shape
        assert np.max(np.abs(out - single)) < 1e-3

    def test_eq_streaming_chunk_invariance(self, rng):
        rate = 16000
        x = clip(rng, 0.8, rate)
        p = RenderParams(target_layout="5.1 (Standard)", bass_gain=1.6,
                         treble_gain=0.7)
        a = streaming.render_streaming(x, rate, p, seed=5, chunk_seconds=0.2)
        b = streaming.render_streaming(x, rate, p, seed=5, chunk_seconds=0.45)
        assert np.max(np.abs(a - b)) < 1e-5

    def test_eq_streaming_with_metrics(self, rng):
        from audio_raytracing_studio_tpu.metering import loudness

        rate = 16000
        x = clip(rng, 1.1, rate)
        p = RenderParams(target_layout="Stereo", bass_gain=1.8)
        out, metrics = streaming.render_streaming(
            x, rate, p, seed=2, chunk_seconds=0.4, with_metrics=True
        )
        ref = loudness.audio_metrics(jnp.asarray(out.T), rate)
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)

    def test_pcm16_output_bit_identical(self, rng):
        """Device-side PCM16 quantization returns exactly the bits the host
        contract produces (clip ±OUTPUT_CLIP → wavio.encode_pcm16), at half
        the device→host transfer."""
        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.utils import wavio

        rate = 16000
        x = clip(rng, 1.2, rate)
        p = RenderParams(target_layout="5.1 (Standard)", room_size=80.0,
                         bass_gain=1.6, treble_gain=0.7)
        f = streaming.render_streaming(x, rate, p, seed=4, chunk_seconds=0.4)
        q = streaming.render_streaming(
            x, rate, p, seed=4, chunk_seconds=0.4, pcm16_output=True
        )
        assert q.dtype == np.int16 and q.shape == f.shape
        host = wavio.encode_pcm16(
            np.clip(f, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
        )
        assert np.array_equal(q, host)

    def test_pcm16_output_with_metrics(self, rng):
        """Metrics still measure the float signal when the output returns
        quantized."""
        rate = 16000
        x = clip(rng, 1.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0)
        out_f, m_f = streaming.render_streaming(
            x, rate, p, seed=1, chunk_seconds=0.5, with_metrics=True
        )
        out_q, m_q = streaming.render_streaming(
            x, rate, p, seed=1, chunk_seconds=0.5, with_metrics=True,
            pcm16_output=True,
        )
        assert out_q.dtype == np.int16
        assert m_q == m_f

    def test_metrics_match_single_device_meter(self, rng):
        import jax.numpy as jnp
        from audio_raytracing_studio_tpu.metering import loudness as jl

        rate = 16000
        x = clip(rng, 2.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.0)
        out, metrics = streaming.render_streaming(
            x, rate, p, seed=3, chunk_seconds=0.7, with_metrics=True
        )
        ref = jl.audio_metrics(jnp.asarray(out.T), rate)
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)
        assert metrics["true_peak_dbfs"] == pytest.approx(
            float(ref["true_peak_dbfs"]), abs=1e-3
        )
        assert metrics["rms_dbfs"] == pytest.approx(float(ref["rms_dbfs"]), abs=1e-3)

    def test_metrics_match_meter_on_delayed_layout(self, rng):
        """Review regression: 7.1's 12 ms side-channel delay spills past
        len_out in the oversized streaming buffer; the meter (and the final
        conditional normalize) must see the len_out-trimmed samples only."""
        import jax.numpy as jnp
        from audio_raytracing_studio_tpu.metering import loudness as jl

        rate = 16000
        x = clip(rng, 2.0, rate)
        p = RenderParams(target_layout="7.1 (Surround)", room_size=60.0,
                         air_absorption=0.0, z_pos=0.6)
        out, metrics = streaming.render_streaming(
            x, rate, p, seed=5, chunk_seconds=0.7, with_metrics=True
        )
        ref = jl.audio_metrics(jnp.asarray(out.T), rate)
        assert metrics["rms_dbfs"] == pytest.approx(float(ref["rms_dbfs"]), abs=1e-3)
        assert metrics["true_peak_dbfs"] == pytest.approx(
            float(ref["true_peak_dbfs"]), abs=1e-3
        )
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)

    def test_metrics_only_mode(self, rng):
        """return_output=False skips the bulk transfer, same metrics."""
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0)
        _out, m_full = streaming.render_streaming(
            x, rate, p, seed=2, chunk_seconds=0.5, with_metrics=True
        )
        none, m_only = streaming.render_streaming(
            x, rate, p, seed=2, chunk_seconds=0.5, with_metrics=True,
            return_output=False,
        )
        assert none is None
        assert m_only == m_full
        with pytest.raises(ValueError, match="with_metrics"):
            streaming.render_streaming(x, rate, p, return_output=False)

    def test_stream_eq_dynamic_knob_matches_default(self, rng, monkeypatch):
        """The default streaming EQ is the traced-n0 padded-grid path
        (round-4 on-chip A/B). ARS_STREAM_EQ_DYNAMIC=0 forces the legacy
        per-n0 exact executables — the rendered audio must match."""
        rate = 8000
        x = clip(rng, 1.2, rate)
        p = RenderParams(
            target_layout="Stereo", room_size=60.0,
            bass_gain=1.6, treble_gain=0.7,
        )
        base = np.asarray(
            streaming.render_streaming(x, rate, p, seed=3, chunk_seconds=0.5)
        )
        monkeypatch.setenv("ARS_STREAM_EQ_DYNAMIC", "0")
        static = np.asarray(
            streaming.render_streaming(x, rate, p, seed=3, chunk_seconds=0.5)
        )
        np.testing.assert_allclose(static, base, atol=5e-5)

    def test_nonfinite_chunk_seconds_is_clean_valueerror(self, rng):
        """int(inf·rate) was an OverflowError traceback through the CLI
        (fuzz-found, cli mode seed 1210271) — must be the ValueError the
        error contract maps to exit 2."""
        rate = 8000
        x = clip(rng, 0.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0)
        for bad in (float("inf"), float("nan"), 0.0, -1.0):
            with pytest.raises(ValueError, match="chunk_seconds"):
                streaming.render_streaming(x, rate, p, chunk_seconds=bad)

    def test_metrics_with_chunk_shorter_than_meter_fir(self, rng):
        """Review regression: chunk < the 8192-tap K-weighting FIR crashed
        the chunked meter with a broadcast error; the chunk floor must
        cover the carried meter tail."""
        import jax.numpy as jnp
        from audio_raytracing_studio_tpu.metering import loudness as jl

        rate = 8000
        x = clip(rng, 3.0, rate)
        ir = (rng.standard_normal((64, 2)) * 0.3).astype(np.float32)
        p = RenderParams(use_external_ir=True, target_layout="Stereo", dry_wet=0.6)
        out, metrics = streaming.render_streaming(
            x, rate, p, external_ir=ir, chunk_seconds=0.5, with_metrics=True
        )
        ref = jl.audio_metrics(jnp.asarray(out.T), rate)
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)

    def test_metrics_silence(self):
        rate = 16000
        x = np.zeros(rate, np.float32)
        p = RenderParams(target_layout="Stereo", room_size=60.0)
        out, metrics = streaming.render_streaming(
            x, rate, p, chunk_seconds=0.4, with_metrics=True
        )
        assert metrics["lufs"] == float("-inf")


class TestExactAirStreaming:
    """Round-4 VERDICT item 4: fast_filters=False runs the reference's
    exact-length air transform on the streaming path (blockwise traced-n0
    Bluestein over the separated late stream) — matching the single-shot
    EXACT pipeline to float32 round-off, not just the ≤1e-3 fast envelope."""

    def test_exact_air_matches_exact_single_shot(self, rng):
        rate = 16000
        x = clip(rng, 2.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0,
                         air_absorption=0.7)
        out = streaming.render_streaming(
            x, rate, p, seed=3, chunk_seconds=0.4, fast_filters=False
        )
        exact = pipeline.render(x, rate, p, seed=3, fast_filters=False)
        assert out.shape == exact.shape
        assert np.max(np.abs(out - exact)) < 1e-4  # exact mode, not 2e-4 fast

    def test_exact_air_differs_from_fast_where_expected(self, rng):
        # sanity: the exact path is actually a different computation — at a
        # strong absorption the conv-grid approximation deviates ~1e-4-2e-4
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=80.0,
                         air_absorption=0.9)
        fast = streaming.render_streaming(x, rate, p, seed=5, chunk_seconds=0.3)
        exact = streaming.render_streaming(
            x, rate, p, seed=5, chunk_seconds=0.3, fast_filters=False
        )
        d = np.max(np.abs(fast - exact))
        assert 1e-7 < d < 1e-3

    def test_exact_air_chunk_invariance(self, rng):
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0,
                         air_absorption=0.5)
        a = streaming.render_streaming(
            x, rate, p, seed=1, chunk_seconds=0.3, fast_filters=False
        )
        b = streaming.render_streaming(
            x, rate, p, seed=1, chunk_seconds=1.1, fast_filters=False
        )
        assert np.max(np.abs(a - b)) < 1e-5

    def test_exact_air_with_eq_and_layout_and_metrics(self, rng):
        # the full exact stage stack on one streamed render: split conv →
        # exact air → exact EQ → pan/map → meter, vs the exact single shot
        rate = 16000
        x = clip(rng, 1.5, rate)
        p = RenderParams(target_layout="5.1 (Standard)", room_size=60.0,
                         air_absorption=0.6, bass_gain=1.6, treble_gain=0.7,
                         z_pos=0.4)
        out, metrics = streaming.render_streaming(
            x, rate, p, seed=2, chunk_seconds=0.5, with_metrics=True,
            fast_filters=False,
        )
        exact, m_exact = pipeline.render(
            x, rate, p, seed=2, fast_filters=False, return_metrics=True
        )
        assert out.shape == exact.shape
        assert np.max(np.abs(out - exact)) < 1e-4
        assert abs(metrics["lufs"] - m_exact["lufs"]) < 0.01

    def test_exact_air_no_late_kernel_is_noop_path(self, rng):
        # air with the late stream disabled: exact == fast == single shot
        # (the filter only ever touched the late wet stream)
        rate = 16000
        x = clip(rng, 1.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0,
                         air_absorption=0.8, late_level=0.0)
        a = streaming.render_streaming(
            x, rate, p, seed=4, chunk_seconds=0.3, fast_filters=False
        )
        b = pipeline.render(x, rate, p, seed=4, fast_filters=False)
        assert np.max(np.abs(a - b)) < 2e-5
