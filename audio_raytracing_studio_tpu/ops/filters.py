"""Frequency-domain filters: air-absorption tilt and shelf EQ.

Both are *circular* FFT-domain gain curves applied at the exact signal
length — that is the reference's definition (raytracer_studio.py:310-336 for
air absorption, :387-398/:441-452 for the EQ), so the FFT length here is a
parity-bearing quantity, not a tuning knob.  Gain curves are built from the
static (n, rate) grid as NumPy constants; the user gains stay traced.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .. import config
from . import convolution, fftops

# The exact-length circular filters below are affine in their traced
# scalars over STATIC per-bin curves: air gain = 1 − c·ramp, shelf EQ
# gain = 1 + (b−1)·bass_mask + (t−1)·treble_mask.  A circular filter with
# a static curve g reduces to positions [n, 2n) of ONE fast-grid linear
# convolution with the doubled time kernel h2 = [h, h], h = irfft_n(g)
# (y_circ[k] = Σ_j x[j]·h[(k−j) mod n] — every wrap term is present in
# the linear convolution of x with the 2n-periodic extension).  So the
# whole exact filter costs one real rfft/irfft roundtrip at
# m = fast_fft_length(3n−1) with host-precomputed kernel spectra —
# replacing two exact-length Bluestein DFTs (four complex m'-transforms).
# Threshold: below ~2^17 samples the Bluestein path is cheap anyway and
# avoids the 3× grid.
_AFFINE_MIN_N = 1 << 17


@functools.lru_cache(maxsize=8)
def _wrap_spectrum(curve_key, n: int, rate: int):
    """rfft_m(h2) for one static gain curve — host float64 → complex64.

    curve_key ∈ {"air_ramp", "bass_mask", "treble_mask"}."""
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    if curve_key == "air_ramp":
        start = config.AIR_ABSORPTION_START_HZ
        max_freq = freqs[-1] if len(freqs) > 0 else start + 1
        if max_freq > start:
            g = np.clip((freqs - start) / (max_freq - start), 0.0, 1.0)
            g = np.where(freqs >= start, g, 0.0)
        else:
            g = np.zeros_like(freqs)
    elif curve_key == "bass_mask":
        g = ((freqs > 1e-6) & (freqs <= config.EQ_BASS_CUTOFF_HZ)).astype(
            np.float64
        )
    elif curve_key == "treble_mask":
        g = (freqs >= config.EQ_TREBLE_CUTOFF_HZ).astype(np.float64)
    else:  # pragma: no cover
        raise ValueError(curve_key)
    h = np.fft.irfft(g.astype(np.float64), n)
    h2 = np.concatenate([h, h])
    m = convolution.fast_fft_length(3 * n - 1)
    return np.fft.rfft(h2, m).astype(np.complex64), m


def _apply_affine_circular(
    signal: jnp.ndarray, n: int, rate: int, terms
) -> jnp.ndarray:
    """y = signal + Σ c_i · (signal ⊛_circ h_i), one real roundtrip.

    terms: list of (curve_key, traced coefficient).  The fast grid is
    rank-≤3 real rfft/irfft at 3·2^k — the layout-clean case on this
    backend (the rank-4 hazard of convolve_full does not arise).
    """
    specs = [_wrap_spectrum(k, n, rate) for k, _ in terms]
    m = specs[0][1]
    x = signal[..., :n]
    X = jnp.fft.rfft(x, n=m, axis=-1)
    H = None
    for (spec_np, _m), (_key, c) in zip(specs, terms):
        term = jnp.asarray(spec_np) * c
        H = term if H is None else H + term
    wrap = jnp.fft.irfft(X * H, n=m, axis=-1)[..., n : 2 * n]
    return (x + wrap).astype(jnp.float32)


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
    if not fftops.is_power_of_two(n) and n >= _AFFINE_MIN_N:
        # gain = 1 − damping·ramp is affine in the traced scalar → one
        # real fast-grid roundtrip instead of two Bluestein DFTs
        damping = jnp.clip(factor, 0.0, 1.0) * config.AIR_ABSORPTION_MAX_DAMPING
        return _apply_affine_circular(
            signal, n, rate, [("air_ramp", -damping)]
        )
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
    if not fftops.is_power_of_two(n) and n >= _AFFINE_MIN_N:
        # gain = 1 + (b−1)·bass_mask + (t−1)·treble_mask — affine in both
        # traced scalars; the two wrap convolutions share one roundtrip
        lo, hi = config.EQ_GAIN_CLIP
        cb = jnp.clip(bass_gain, lo, hi) - 1.0
        ct = jnp.clip(treble_gain, lo, hi) - 1.0
        return _apply_affine_circular(
            signal, n, rate, [("bass_mask", cb), ("treble_mask", ct)]
        )
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
