"""Bluestein exact-FFT unit tests at awkward lengths."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracing_studio_tpu.ops import fftops


@pytest.mark.parametrize("n", [3, 17, 100, 1000, 12289, 129599, 65536])
def test_rfft_matches_numpy(rng, n):
    x = rng.standard_normal((2, n)).astype(np.float32)
    ours = np.asarray(fftops.rfft_exact(jnp.asarray(x), n))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = max(1.0, np.max(np.abs(ref)))
    assert np.max(np.abs(ours - ref)) / scale < 5e-6


@pytest.mark.parametrize("n", [3, 17, 100, 999, 12288, 129599])
def test_roundtrip(rng, n):
    x = rng.standard_normal((1, n)).astype(np.float32)
    back = np.asarray(fftops.irfft_exact(fftops.rfft_exact(jnp.asarray(x), n), n))
    assert np.max(np.abs(back - x)) < 2e-5


def test_circular_gain_matches_numpy(rng):
    n = 48001  # odd length
    x = rng.standard_normal((2, n)).astype(np.float32)
    gain = rng.uniform(0.2, 2.0, size=n // 2 + 1).astype(np.float32)
    ours = np.asarray(fftops.apply_circular_gain(jnp.asarray(x), jnp.asarray(gain)))
    ref = np.fft.irfft(np.fft.rfft(x, axis=-1) * gain, n=n, axis=-1)
    assert np.max(np.abs(ours - ref)) < 5e-5


def test_pow2_uses_direct_path(rng):
    n = 4096
    x = rng.standard_normal((1, n)).astype(np.float32)
    ours = np.asarray(fftops.rfft_exact(jnp.asarray(x), n))
    ref = np.fft.rfft(x, axis=-1)
    assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 1e-6
