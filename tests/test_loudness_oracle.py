"""BS.1770 oracle meter tests: coefficient design vs the ITU 48 kHz table,
and loudness of known signals."""

import numpy as np
import pytest

from audio_raytracing_studio_tpu.metering import kweighting as kw
from audio_raytracing_studio_tpu.oracle import loudness


def test_shelf_coefficients_match_itu_table_at_48k():
    # BS.1770-4 Table 1 (pre-filter, fs=48 kHz)
    b, a = kw.high_shelf_coefficients(48000.0)
    assert b == pytest.approx(
        [1.53512485958697, -2.69169618940638, 1.19839281085285], abs=2e-5
    )
    assert a == pytest.approx([1.0, -1.69065929318241, 0.73248077421585], abs=2e-5)


def test_highpass_coefficients_match_itu_table_at_48k():
    # BS.1770-4 Table 2 (RLB filter, fs=48 kHz)
    b, a = kw.high_pass_coefficients(48000.0)
    assert a == pytest.approx([1.0, -1.99004745483398, 0.99007225036621], abs=2e-5)
    assert b == pytest.approx([1.0, -2.0, 1.0], abs=2e-4)


def test_mono_sine_997hz_full_scale():
    """BS.1770-4: a 0 dBFS 997 Hz sine on one channel reads −3.01 LKFS."""
    rate = 48000
    t = np.arange(5 * rate) / rate
    x = np.sin(2 * np.pi * 997.0 * t)
    lufs = loudness.integrated_loudness(x, rate)
    assert lufs == pytest.approx(-3.01, abs=0.05)


def test_gain_linearity():
    rate = 48000
    t = np.arange(3 * rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    l1 = loudness.integrated_loudness(x, rate)
    l2 = loudness.integrated_loudness(x * 0.5, rate)
    assert l1 - l2 == pytest.approx(6.0206, abs=0.05)


def test_silence_is_neg_inf():
    assert loudness.integrated_loudness(np.zeros(48000), 48000) == -np.inf


def test_short_signal_below_400ms():
    assert loudness.integrated_loudness(np.ones(4800) * 0.5, 48000) == -np.inf


def test_gating_ignores_silence_padding():
    """Appending silence must not change gated loudness much (gating test)."""
    rate = 48000
    t = np.arange(3 * rate) / rate
    x = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    l1 = loudness.integrated_loudness(x, rate)
    l2 = loudness.integrated_loudness(np.concatenate([x, np.zeros(3 * rate)]), rate)
    assert abs(l1 - l2) < 0.3


def test_metrics_dict_reference_conventions(tone48k):
    x, rate = tone48k
    m = loudness.calculate_audio_metrics(np.stack([x, x], 1), rate)
    assert m["lufs"] is not None and np.isfinite(m["lufs"])
    peak = 20 * np.log10(np.max(np.abs(x)))
    assert m["true_peak_dbfs"] == pytest.approx(peak, abs=1e-6)
    rms = 20 * np.log10(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
    assert m["rms_dbfs"] == pytest.approx(rms, abs=1e-6)


def test_metrics_silence():
    m = loudness.calculate_audio_metrics(np.zeros((48000, 2)), 48000)
    assert m["lufs"] == -np.inf
    assert m["true_peak_dbfs"] == -np.inf
