"""Frequency-domain filters: air-absorption tilt and shelf EQ.

Both are *circular* FFT-domain gain curves applied at the exact signal
length — that is the reference's definition (raytracer_studio.py:310-336 for
air absorption, :387-398/:441-452 for the EQ), so the FFT length here is a
parity-bearing quantity, not a tuning knob.  Gain curves are built from the
static (n, rate) grid as NumPy constants; the user gains stay traced.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from . import fftops


def air_absorption_gain(n_fft: int, rate: int, factor: jnp.ndarray) -> jnp.ndarray:
    """Per-bin gain: 1.0 below 2 kHz, ramping to 1−0.8·factor at Nyquist."""
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    start = config.AIR_ABSORPTION_START_HZ
    max_freq = freqs[-1] if len(freqs) > 0 else start + 1
    if max_freq > start:
        ramp = np.clip((freqs - start) / (max_freq - start), 0.0, 1.0)
        ramp = np.where(freqs >= start, ramp, 0.0).astype(np.float32)
    else:
        ramp = np.zeros_like(freqs, dtype=np.float32)
    max_damping = jnp.clip(factor, 0.0, 1.0) * config.AIR_ABSORPTION_MAX_DAMPING
    return 1.0 - jnp.asarray(ramp) * max_damping


def apply_air_absorption(
    signal: jnp.ndarray, rate: int, factor: jnp.ndarray
) -> jnp.ndarray:
    """Air-absorption low-pass over the last axis (length = FFT length).

    signal: (..., n) float32.  The caller decides statically whether to apply
    it (reference skips when factor < 0.01, raytracer_studio.py:312).
    """
    n = signal.shape[-1]
    if n < 2:
        return signal
    gain = air_absorption_gain(n, rate, factor)
    return fftops.apply_circular_gain(signal, gain)


def shelf_eq_gain(
    n_fft: int, rate: int, bass_gain: jnp.ndarray, treble_gain: jnp.ndarray
) -> jnp.ndarray:
    """Per-bin gain: bass on (0, 250] Hz, treble on [4 kHz, ∞) (static masks)."""
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    bass_mask = jnp.asarray((freqs > 1e-6) & (freqs <= config.EQ_BASS_CUTOFF_HZ))
    treble_mask = jnp.asarray(freqs >= config.EQ_TREBLE_CUTOFF_HZ)
    lo, hi = config.EQ_GAIN_CLIP
    gain = jnp.where(bass_mask, jnp.clip(bass_gain, lo, hi), 1.0)
    return jnp.where(treble_mask, jnp.clip(treble_gain, lo, hi), gain)


def apply_shelf_eq(
    signal: jnp.ndarray, rate: int, bass_gain: jnp.ndarray, treble_gain: jnp.ndarray
) -> jnp.ndarray:
    """Shelf EQ over the last axis at the exact signal length.

    The caller statically skips this when both gains are ≈1 (reference
    raytracer_studio.py:389).
    """
    n = signal.shape[-1]
    if n < 2:
        return signal
    gain = shelf_eq_gain(n, rate, bass_gain, treble_gain)
    return fftops.apply_circular_gain(signal, gain)


def conditional_peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Rescale only if |x|max > 1; zero out sub-1e-9 residue.

    jnp.where form of the reference's data-dependent normalization branches
    (raytracer_studio.py:402-404, :457, :497-499, :558-560).  Reduction runs
    over ALL axes — per-render, matching the reference's np.max over the
    whole array.
    """
    max_val = jnp.max(jnp.abs(x))
    scale = jnp.where(max_val > 1.0, 1.0 / max_val, 1.0)
    zero_out = max_val < 1e-9
    return jnp.where(zero_out, jnp.zeros_like(x), x * scale)
