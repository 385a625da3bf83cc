"""JAX on-device meter vs the float64 oracle meter."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracing_studio_tpu.metering import loudness as jl
from audio_raytracing_studio_tpu.oracle import loudness as ol


def make_signal(rng, seconds=3.0, rate=48000, channels=1):
    t = np.arange(int(seconds * rate)) / rate
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)[:, None]
        + 0.1 * np.sin(2 * np.pi * 2500 * t)[:, None]
        + 0.03 * rng.standard_normal((len(t), channels))
    ).astype(np.float32)
    return np.broadcast_to(x[:, :1], (len(t), channels)).copy() if x.shape[1] != channels else x


def test_k_weight_matches_oracle(rng):
    rate = 48000
    x = make_signal(rng, 1.0, rate)[:, 0]
    ours = np.asarray(jl.k_weight(jnp.asarray(x), rate))
    ref = ol.k_weight(x.astype(np.float64), rate)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_integrated_loudness_matches_oracle(rng):
    rate = 48000
    x = make_signal(rng, 4.0, rate)[:, 0]
    ours = float(jl.integrated_loudness(jnp.asarray(x), rate, weights=np.array([1.0])))
    ref = ol.integrated_loudness(x, rate)
    assert ours == pytest.approx(ref, abs=0.01)


def test_loudness_44100(rng):
    rate = 44100
    x = make_signal(rng, 2.5, rate)[:, 0]
    ours = float(jl.integrated_loudness(jnp.asarray(x), rate, weights=np.array([1.0])))
    ref = ol.integrated_loudness(x, rate)
    assert ours == pytest.approx(ref, abs=0.01)


def test_gating_with_quiet_section(rng):
    """Signal with a silent half exercises both gates."""
    rate = 48000
    x = make_signal(rng, 2.0, rate)[:, 0]
    x = np.concatenate([x, np.full(2 * rate, 1e-5, np.float32)])
    ours = float(jl.integrated_loudness(jnp.asarray(x), rate, weights=np.array([1.0])))
    ref = ol.integrated_loudness(x, rate)
    assert ours == pytest.approx(ref, abs=0.02)


def test_997hz_calibration():
    rate = 48000
    t = np.arange(5 * rate) / rate
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    lufs = float(jl.integrated_loudness(jnp.asarray(x), rate, weights=np.array([1.0])))
    assert lufs == pytest.approx(-3.01, abs=0.05)


def test_silence_neg_inf():
    x = jnp.zeros(48000, jnp.float32)
    assert float(jl.integrated_loudness(x, 48000, weights=np.array([1.0]))) == -np.inf


def test_audio_metrics_matches_oracle(rng, tone48k):
    x, rate = tone48k
    stereo = np.stack([x, 0.7 * x], axis=1)
    ours = jl.audio_metrics(jnp.asarray(stereo.T), rate)
    ref = ol.calculate_audio_metrics(stereo, rate)
    assert float(ours["lufs"]) == pytest.approx(ref["lufs"], abs=0.01)
    assert float(ours["true_peak_dbfs"]) == pytest.approx(ref["true_peak_dbfs"], abs=1e-3)
    assert float(ours["rms_dbfs"]) == pytest.approx(ref["rms_dbfs"], abs=1e-3)


def test_masked_metrics_match_trimmed(rng):
    """audio_metrics_masked over a zero-padded buffer == audio_metrics over
    the trimmed signal (the batch-bucket metering path)."""
    from audio_raytracing_studio_tpu.metering import kweighting as kw

    rate = 16000
    x = make_signal(rng, 1.3, rate, channels=2).T  # (C, n)
    valid = x.shape[1]
    padded = np.concatenate([x, np.zeros((2, 5000), np.float32)], axis=1)
    ref = jl.audio_metrics(jnp.asarray(x), rate)
    got = jl.audio_metrics_masked(
        jnp.asarray(padded), rate,
        jnp.int32(valid), jnp.int32(kw.block_count(valid, rate)),
    )
    assert float(got["lufs"]) == pytest.approx(float(ref["lufs"]), abs=1e-3)
    assert float(got["true_peak_dbfs"]) == pytest.approx(
        float(ref["true_peak_dbfs"]), abs=1e-5
    )
    assert float(got["rms_dbfs"]) == pytest.approx(
        float(ref["rms_dbfs"]), abs=1e-4
    )


def test_masked_metrics_short_clip_gates_out(rng):
    """valid_len below one 400 ms gating block → LUFS −inf, like trimming."""
    from audio_raytracing_studio_tpu.metering import kweighting as kw

    rate = 16000
    x = make_signal(rng, 0.2, rate, channels=1).T
    valid = x.shape[1]
    padded = np.concatenate([x, np.zeros((1, rate), np.float32)], axis=1)
    got = jl.audio_metrics_masked(
        jnp.asarray(padded), rate,
        jnp.int32(valid), jnp.int32(kw.block_count(valid, rate)),
    )
    assert np.isneginf(float(got["lufs"]))
    assert np.isfinite(float(got["rms_dbfs"]))


def test_oversampled_true_peak_exceeds_sample_peak():
    """An inter-sample peak invisible to sample metering is caught at 4x."""
    rate = 48000
    t = np.arange(rate) / rate
    # near-Nyquist tone sampled so true peaks land between samples
    x = (0.9 * np.sin(2 * np.pi * (rate / 4 + 11.7) * t + 0.4)).astype(np.float32)
    sp = float(jl.sample_peak_dbfs(jnp.asarray(x)))
    tp = float(jl.oversampled_true_peak_dbfs(jnp.asarray(x)))
    assert tp >= sp - 1e-4
    assert tp == pytest.approx(20 * np.log10(0.9), abs=0.05)


def test_channel_weights_unknown_counts_are_unweighted():
    """Index-3-is-LFE only holds for this repo's 6/8-channel layouts; a quad
    or 5.0 file must not get a rear channel silenced or boosted."""
    from audio_raytracing_studio_tpu.metering import kweighting as kw

    assert np.allclose(kw.channel_weights(4), 1.0)
    assert np.allclose(kw.channel_weights(5), 1.0)
    w6 = kw.channel_weights(6)
    assert w6[3] == 0.0 and np.allclose(w6[4:], 1.41)
    w8 = kw.channel_weights(8)
    assert w8[3] == 0.0 and np.allclose(w8[4:], 1.41)
