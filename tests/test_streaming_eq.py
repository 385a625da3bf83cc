"""Blockwise single-chip exact-length shelf EQ (parallel/streaming_eq.py).

The transform must match ops.filters.apply_shelf_eq — the reference's
whole-signal circular EQ (raytracer_studio.py:392-397) — at float32
round-off for arbitrary (odd, prime, pow2-adjacent) exact lengths and any
block-row count, while never allocating an n0-sized FFT.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracing_studio_tpu.ops import filters
from audio_raytracing_studio_tpu.parallel.streaming_eq import (
    _fftm,
    _ifftm,
    shelf_eq_streaming,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestBlockwiseFFT:
    @pytest.mark.parametrize("d,b", [(1, 64), (2, 32), (8, 8), (16, 16), (64, 1)])
    def test_fftm_matches_full_fft(self, rng, d, b):
        x = (rng.standard_normal((d, b)) + 1j * rng.standard_normal((d, b))).astype(
            np.complex64
        )
        got = np.asarray(_fftm(jnp.asarray(x), d, b))
        full = np.fft.fft(x.reshape(-1))
        # row c of the strided output holds bins c + D·t
        expect = full.reshape(b, d).T
        np.testing.assert_allclose(got, expect, atol=5e-4 * np.abs(full).max())

    @pytest.mark.parametrize("d,b", [(2, 32), (16, 16), (8, 128)])
    def test_ifftm_roundtrip(self, rng, d, b):
        x = (rng.standard_normal((d, b)) + 1j * rng.standard_normal((d, b))).astype(
            np.complex64
        )
        back = np.asarray(_ifftm(_fftm(jnp.asarray(x), d, b), d, b))
        np.testing.assert_allclose(back, x, atol=2e-5 * np.abs(x).max())


class TestStreamingEQ:
    @pytest.mark.parametrize(
        "n0,n_total,rate,d",
        [
            (4801, 6000, 8000, 16),   # odd n0, buffer longer than signal
            (12007, 12007, 44100, 8),  # prime n0, exact-fit buffer
            (777, 1024, 48000, 16),
            (8192, 9000, 48000, 16),  # pow2 n0
            (97, 97, 8000, 4),
        ],
    )
    def test_matches_exact_eq(self, rng, n0, n_total, rate, d):
        x = rng.standard_normal((2, n_total)).astype(np.float32)
        x[:, n0:] = 0.0
        ref = filters.apply_shelf_eq(
            jnp.asarray(x[:, :n0]), rate, jnp.float32(1.7), jnp.float32(0.55)
        )
        got = shelf_eq_streaming(jnp.asarray(x), n0, rate, 1.7, 0.55, d_rows=d)
        assert float(jnp.max(jnp.abs(got[:, :n0] - ref))) < 5e-5
        if n_total > n0:  # positions past the signal come back zero
            assert float(jnp.max(jnp.abs(got[:, n0:]))) == 0.0

    @pytest.mark.parametrize(
        "n0,n_total,rate,d",
        [
            (4801, 6000, 8000, 16),
            (12007, 12007, 44100, 8),
            (777, 1024, 48000, 16),
            (97, 97, 8000, 4),
        ],
    )
    def test_dynamic_matches_exact_eq(self, rng, n0, n_total, rate, d):
        """dynamic=True: traced-n0 chirps at the PADDED grid must equal the
        static exact EQ (and zero the buffer past n0)."""
        x = rng.standard_normal((2, n_total)).astype(np.float32)
        x[:, n0:] = 0.0
        ref = filters.apply_shelf_eq(
            jnp.asarray(x[:, :n0]), rate, jnp.float32(1.7), jnp.float32(0.55)
        )
        got = shelf_eq_streaming(
            jnp.asarray(x), n0, rate, 1.7, 0.55, d_rows=d, dynamic=True
        )
        assert float(jnp.max(jnp.abs(got[:, :n0] - ref))) < 5e-5
        if n_total > n0:
            assert float(jnp.max(jnp.abs(got[:, n0:]))) == 0.0

    def test_dynamic_shares_one_executable_across_lengths(self, rng):
        """The point of dynamic mode: different exact lengths over the same
        padded buffer reuse ONE compiled set (static mode compiles per n0)."""
        from audio_raytracing_studio_tpu.parallel.streaming_eq import (
            _compiled_eq_dynamic,
        )

        _compiled_eq_dynamic.cache_clear()
        rate, n_total = 16000, 4096
        x = rng.standard_normal((2, n_total)).astype(np.float32)
        for n0 in (4096, 3777, 2049, 1111):
            xa = x.copy()
            xa[:, n0:] = 0.0
            ref = filters.apply_shelf_eq(
                jnp.asarray(xa[:, :n0]), rate, jnp.float32(2.0), jnp.float32(0.4)
            )
            got = shelf_eq_streaming(
                jnp.asarray(xa), n0, rate, 2.0, 0.4, d_rows=8, dynamic=True
            )
            assert float(jnp.max(jnp.abs(got[:, :n0] - ref))) < 5e-5, n0
        assert _compiled_eq_dynamic.cache_info().currsize == 1

    def test_d_rows_invariance(self, rng):
        n0, rate = 3001, 16000
        x = rng.standard_normal((1, n0)).astype(np.float32)
        outs = [
            np.asarray(shelf_eq_streaming(jnp.asarray(x), n0, rate, 2.2, 0.4, d_rows=d))
            for d in (1, 4, 16, 64)
        ]
        for o in outs[1:]:
            np.testing.assert_allclose(o, outs[0], atol=1e-5)

    def test_odd_channel_count(self, rng):
        """3 channels exercise the packed pair AND the single-channel tail
        in one call; each channel must match the exact EQ independently
        (no cross-channel leak from the L+iR packing)."""
        n0, rate = 2203, 44100
        x = rng.standard_normal((3, n0)).astype(np.float32)
        ref = filters.apply_shelf_eq(
            jnp.asarray(x), rate, jnp.float32(1.7), jnp.float32(0.55)
        )
        got = shelf_eq_streaming(jnp.asarray(x), n0, rate, 1.7, 0.55, d_rows=8)
        assert float(jnp.max(jnp.abs(got - ref))) < 5e-5

    def test_unity_gains_identity(self, rng):
        n0, rate = 1501, 22050
        x = rng.standard_normal((2, n0)).astype(np.float32)
        got = shelf_eq_streaming(jnp.asarray(x), n0, rate, 1.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), x, atol=5e-6)

    def test_gain_clip_applied(self, rng):
        """Gains outside EQ_GAIN_CLIP are clipped identically to the
        single-shot path (config contract)."""
        n0, rate = 2001, 8000
        x = rng.standard_normal((1, n0)).astype(np.float32)
        ref = filters.apply_shelf_eq(
            jnp.asarray(x), rate, jnp.float32(99.0), jnp.float32(0.0)
        )
        got = shelf_eq_streaming(jnp.asarray(x), n0, rate, 99.0, 0.0)
        assert float(jnp.max(jnp.abs(got - ref))) < 5e-5

    def test_length_gate(self, rng):
        x = jnp.zeros((1, 8), jnp.float32)
        with pytest.raises(ValueError, match="2\\^30"):
            shelf_eq_streaming(x, 1 << 30, 48000, 1.5, 1.0)

    def test_non_pow2_d_rows_rejected(self, rng):
        """A d_rows that does not divide the pow2 m would silently run the
        Bluestein convolution at a truncated length (aliasing) and hand the
        backend a non-pow2 complex FFT — refuse instead."""
        x = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
        with pytest.raises(ValueError, match="power of two"):
            shelf_eq_streaming(x, 500, 8000, 1.5, 0.7, d_rows=12)
