"""Frequency-domain filters: air-absorption tilt and shelf EQ.

Both are *circular* FFT-domain gain curves applied at the exact signal
length — that is the reference's definition (raytracer_studio.py:310-336 for
air absorption, :387-398/:441-452 for the EQ), so the FFT length here is a
parity-bearing quantity, not a tuning knob.  Gain curves are built from the
static (n, rate) grid as NumPy constants; the user gains stay traced.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import chirp, convolution, fftops

# The exact-length circular filters below are affine in their traced
# scalars over STATIC per-bin curves: air gain = 1 − c·ramp, shelf EQ
# gain = 1 + (b−1)·bass_mask + (t−1)·treble_mask.  A circular filter with
# a static curve g reduces to positions [n, 2n) of ONE fast-grid m-point
# circular convolution with the doubled time kernel h2 = [h, h],
# h = irfft_n(g): y_circ[k] = Σ_j x[j]·h[(k−j) mod n] = c[k+n] where
# c = x ∗ h2 (every wrap term is present in the linear convolution with
# the 2n-periodic extension).  Any m ≥ 2n suffices — c is supported on
# [0, 3n−2], and the k=1 alias c[q+m] into the read window q ∈ [n, 2n)
# would need q ≤ 3n−2−m ≤ n−2 < n.  So the whole exact filter costs one
# real rfft/irfft roundtrip at m = fast grid ≥ 2n with host-precomputed
# kernel spectra — replacing two exact-length Bluestein DFTs (four
# complex m'-transforms).  Threshold: below ~2^17 samples the Bluestein
# path is cheap anyway and avoids the 2× grid.
_AFFINE_MIN_N = 1 << 17


def _air_ramp_np(n: int, rate: int) -> np.ndarray:
    """Static air-absorption ramp per rfft bin (host float64): 0 below the
    2 kHz start, rising linearly to 1 at Nyquist.  The SINGLE definition of
    this parity-bearing curve — both the exact path (air_absorption_gain)
    and the affine wrap path (_wrap_kernel) build from it."""
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    start = config.AIR_ABSORPTION_START_HZ
    max_freq = freqs[-1] if len(freqs) > 0 else start + 1
    if max_freq > start:
        ramp = np.clip((freqs - start) / (max_freq - start), 0.0, 1.0)
        return np.where(freqs >= start, ramp, 0.0)
    return np.zeros_like(freqs)


def _bass_mask_np(n: int, rate: int) -> np.ndarray:
    """Static bass-shelf bin mask (host float64): (0, 250] Hz — one source
    for exact (shelf_eq_gain) and affine (_wrap_kernel) paths."""
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    return ((freqs > 1e-6) & (freqs <= config.EQ_BASS_CUTOFF_HZ)).astype(np.float64)


def _treble_mask_np(n: int, rate: int) -> np.ndarray:
    """Static treble-shelf bin mask (host float64): [4 kHz, ∞)."""
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    return (freqs >= config.EQ_TREBLE_CUTOFF_HZ).astype(np.float64)


_CURVES = {
    "air_ramp": _air_ramp_np,
    "bass_mask": _bass_mask_np,
    "treble_mask": _treble_mask_np,
}


def _wrap_kernel(curve_key, n: int, rate: int) -> np.ndarray:
    """Doubled time kernel h2 = [h, h], h = irfft_n(g) — host float64.

    curve_key ∈ {"air_ramp", "bass_mask", "treble_mask"}; the curves g are
    the same objects the exact-length path applies directly, so the two
    paths cannot drift apart across the _AFFINE_MIN_N threshold."""
    g = _CURVES[curve_key](n, rate)
    h = np.fft.irfft(g.astype(np.float64), n)
    return np.concatenate([h, h])


@functools.lru_cache(maxsize=8)
def _wrap_spectrum(curve_key, n: int, rate: int, pow2: bool = False):
    """rfft_m(h2) for one static gain curve — host float64 → complex64.

    ``pow2`` restricts the grid to powers of two — required under a large
    vmap batch, where rank-3 3·2^k real FFTs pick a pathologically padded
    layout on this backend (8-16× HLO-temp expansion; see
    ops.convolution/StaticSpec.pow2_conv)."""
    h2 = _wrap_kernel(curve_key, n, rate)
    m = (
        fftops.next_power_of_two(2 * n)
        if pow2
        else convolution.fast_fft_length(2 * n)
    )
    return np.fft.rfft(h2, m).astype(np.complex64), m


@functools.lru_cache(maxsize=8)
def _wrap_spectrum_full(curve_key, n: int, rate: int):
    """Full m-point complex spectrum of h2 in ``fft_fast``'s output order
    (radix-3-PERMUTED when m = 3·2^k, natural when m is a power of two) —
    for the pair-packed complex wrap convolution."""
    h2 = _wrap_kernel(curve_key, n, rate)
    m = convolution.fast_fft_length(2 * n)
    H = np.fft.fft(h2, m)
    if not fftops.is_power_of_two(m):
        H = fftops.radix3_permute(H)
    return H.astype(np.complex64), m


def _apply_affine_circular(
    signal: jnp.ndarray, n: int, rate: int, terms, pow2: bool = False
) -> jnp.ndarray:
    """y = signal + Σ c_i · (signal ⊛_circ h_i), one roundtrip.

    terms: list of (curve_key, traced coefficient).

    Stereo signals (shape (..., 2, n) — every pipeline call site) pack
    L+iR into ONE complex stream and ride the batch-safe radix-3
    ``fft_fast``/``ifft_fast`` pair at m = fast(2n): the kernels h_i are
    real, so ifft(fft(L+iR)·Ĥ) = (L∗h) + i(R∗h) splits exactly — two
    complex m-transforms for both channels (the Bluestein form costs
    four), with only pow2 device FFTs issued regardless of batch.  The
    host kernel spectrum multiplies in radix-3-PERMUTED order; everything
    between the pair is elementwise, as the DIF convention requires.

    Other channel counts use a real rfft/irfft roundtrip; there,
    batched renderers pass ``pow2=True`` because rank-3 3·2^k real FFTs
    mis-tile (batch-size-independent — measured 38 GB of HLO temps at
    B=16 on a 16 GB chip).
    """
    x = signal[..., :n]
    if x.ndim >= 2 and x.shape[-2] == 2:
        specs = [_wrap_spectrum_full(k, n, rate) for k, _ in terms]
        m = specs[0][1]
        H = None
        for (spec_np, _m), (_key, c) in zip(specs, terms):
            term = jnp.asarray(spec_np) * c
            H = term if H is None else H + term
        z = jax.lax.complex(x[..., 0, :], x[..., 1, :])
        Z = fftops.fft_fast(z, m)
        wrap = fftops.ifft_fast(Z * H)[..., n : 2 * n]
        wrap = jnp.stack([jnp.real(wrap), jnp.imag(wrap)], axis=-2)
        return (x + wrap).astype(jnp.float32)
    # force pow2 past 4 leading rows even when the caller didn't ask: a
    # 3·2^k real FFT over >4 rows (a 6/8-channel clip, or any batch) hits
    # the measured 8-16× mis-tile whatever the batch flag says (CLAUDE.md;
    # same rule as ops.binaural's 6-8-row transform)
    rows = int(np.prod(x.shape[:-1])) if x.ndim >= 2 else 1
    pow2 = pow2 or rows > 4
    specs = [_wrap_spectrum(k, n, rate, pow2) for k, _ in terms]
    m = specs[0][1]
    X = fftops.rfft_rows(fftops.pad_last(x, m))
    H = None
    for (spec_np, _m), (_key, c) in zip(specs, terms):
        term = jnp.asarray(spec_np) * c
        H = term if H is None else H + term
    wrap = fftops.irfft_rows(X * H)[..., n : 2 * n]
    return (x + wrap).astype(jnp.float32)


def air_absorption_gain(n_fft: int, rate: int, factor: jnp.ndarray) -> jnp.ndarray:
    """Per-bin gain: 1.0 below 2 kHz, ramping to 1−0.8·factor at Nyquist."""
    ramp = _air_ramp_np(n_fft, rate).astype(np.float32)
    max_damping = jnp.clip(factor, 0.0, 1.0) * config.AIR_ABSORPTION_MAX_DAMPING
    return 1.0 - jnp.asarray(ramp) * max_damping


def apply_air_absorption(
    signal: jnp.ndarray, rate: int, factor: jnp.ndarray, pow2: bool = False
) -> jnp.ndarray:
    """Air-absorption low-pass over the last axis (length = FFT length).

    signal: (..., n) float32.  The caller decides statically whether to apply
    it (reference skips when factor < 0.01, raytracer_studio.py:312).
    ``pow2``: set by batched renderers (see ``_apply_affine_circular``).
    """
    n = signal.shape[-1]
    if n < 2:
        return signal
    if not fftops.is_power_of_two(n) and n >= _AFFINE_MIN_N:
        # gain = 1 − damping·ramp is affine in the traced scalar → one
        # real fast-grid roundtrip instead of two Bluestein DFTs
        damping = jnp.clip(factor, 0.0, 1.0) * config.AIR_ABSORPTION_MAX_DAMPING
        return _apply_affine_circular(
            signal, n, rate, [("air_ramp", -damping)], pow2
        )
    gain = air_absorption_gain(n, rate, factor)
    return fftops.apply_circular_gain(signal, gain)


def shelf_eq_gain(
    n_fft: int, rate: int, bass_gain: jnp.ndarray, treble_gain: jnp.ndarray
) -> jnp.ndarray:
    """Per-bin gain: bass on (0, 250] Hz, treble on [4 kHz, ∞) (static masks)."""
    bass_mask = jnp.asarray(_bass_mask_np(n_fft, rate).astype(bool))
    treble_mask = jnp.asarray(_treble_mask_np(n_fft, rate).astype(bool))
    lo, hi = config.EQ_GAIN_CLIP
    gain = jnp.where(bass_mask, jnp.clip(bass_gain, lo, hi), 1.0)
    return jnp.where(treble_mask, jnp.clip(treble_gain, lo, hi), gain)


def apply_shelf_eq(
    signal: jnp.ndarray,
    rate: int,
    bass_gain: jnp.ndarray,
    treble_gain: jnp.ndarray,
    pow2: bool = False,
) -> jnp.ndarray:
    """Shelf EQ over the last axis at the exact signal length.

    The caller statically skips this when both gains are ≈1 (reference
    raytracer_studio.py:389).  ``pow2``: set by batched renderers (see
    ``_apply_affine_circular``).
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
            signal, n, rate, [("bass_mask", cb), ("treble_mask", ct)], pow2
        )
    gain = shelf_eq_gain(n, rate, bass_gain, treble_gain)
    return fftops.apply_circular_gain(signal, gain)


class EQDyn(NamedTuple):
    """Per-clip traced scalars for the length-DYNAMIC exact shelf EQ.

    ``n0`` is the clip's true circular length (its exact output length in
    the render pipeline); the k_* band edges come from the HOST float64
    rfftfreq arithmetic (ops.chirp.band_edges — parity-bearing, cannot be
    derived from a traced n0 on a float32 device).  All int32 scalars, so
    one compiled executable (per static padded length) serves every true
    clip length inside it — batches of mixed-length EQ-on clips share one
    compile instead of one per distinct length.
    """

    n0: jnp.ndarray
    k_lo: jnp.ndarray
    k_bass: jnp.ndarray
    k_treble: jnp.ndarray


def eq_dyn_host(n0: int, rate: int) -> EQDyn:
    """Host-side constructor: float64 band edges for one true length."""
    k_lo, k_bass, k_treble = chirp.band_edges(int(n0), rate)
    return EQDyn(
        n0=np.int32(n0),
        k_lo=np.int32(k_lo),
        k_bass=np.int32(k_bass),
        k_treble=np.int32(k_treble),
    )


def apply_shelf_eq_dynamic(
    signal: jnp.ndarray,
    bass_gain: jnp.ndarray,
    treble_gain: jnp.ndarray,
    dyn: EQDyn,
) -> jnp.ndarray:
    """Exact circular shelf EQ at the TRACED length ``dyn.n0`` of a
    (C, L)-statically-shaped buffer whose signal occupies ``[0, n0)``.

    Double Bluestein convolution at the static pow2 m = fft_length_for(L)
    (valid for every n0 ≤ L since m ≥ 2L−1 ≥ 2n0−1), with the chirp phases
    computed ON DEVICE in exact int32 modular arithmetic from the traced n0
    (ops.chirp — the same machinery as the mesh-sharded EQ, measured
    ≤1.6e-6 vs the host-chirp path).  The forward transform's post-chirp
    and the inverse's pre-chirp cancel (parallel.streaming_eq's identity),
    so the whole EQ is two m-point convolutions with the gain in between.
    Channel pairs pack into one complex stream (the EQ operator has a real
    impulse response).  Output positions ≥ n0 are zero.

    Semantics match ``apply_shelf_eq`` at length n0 exactly; compile count
    is per static L, NOT per n0 — the point: serving batches and directory
    renders of arbitrary-length EQ-on clips reuse one executable per
    half-second bucket (review finding: per-length compiles were an
    unbounded-compile DoS surface).
    """
    c_count, L = signal.shape
    m = chirp.fft_length_for(L)
    n0 = dyn.n0
    inv_n = 1.0 / jnp.asarray(n0, jnp.float32)

    j = jnp.arange(L, dtype=jnp.int32)
    valid = j < n0
    jv = jnp.where(valid, j, 0)
    zero = jnp.complex64(0.0)
    w_fwd = jnp.where(valid, chirp._chirp(jv, n0, -1.0), zero)
    w_inv = jnp.where(valid, chirp._chirp(jv, n0, +1.0), zero)

    km = jnp.arange(m, dtype=jnp.int32)
    kf = fftops.fft_rows(chirp.chirp_kernel_at_bins(km, n0, m, -1.0))
    ki = fftops.fft_rows(chirp.chirp_kernel_at_bins(km, n0, m, +1.0))
    gain = chirp.shelf_gain_from_edges(
        km, n0, dyn.k_lo, dyn.k_bass, dyn.k_treble, bass_gain, treble_gain
    )

    def _stream(z: jnp.ndarray) -> jnp.ndarray:
        """EQ one complex stream (real channel or packed L+iR pair)."""
        u = jnp.zeros(m, jnp.complex64).at[:L].set(z * w_fwd)
        conv1 = fftops.ifft_rows(fftops.fft_rows(u) * kf)
        # forward post-chirp w⁻ and inverse pre-chirp w⁺ cancel: only the
        # gain (zeroed past n0) sits between the two convolutions
        conv2 = fftops.ifft_rows(fftops.fft_rows(conv1 * gain) * ki)
        return conv2[:L] * w_inv * inv_n

    rows = []
    for ch in range(0, c_count - 1, 2):
        y = _stream(jax.lax.complex(signal[ch], signal[ch + 1]))
        rows.extend([jnp.real(y), jnp.imag(y)])
    if c_count % 2:
        y = _stream(signal[c_count - 1].astype(jnp.complex64))
        rows.append(jnp.real(y))
    return jnp.stack(rows).astype(jnp.float32)


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
