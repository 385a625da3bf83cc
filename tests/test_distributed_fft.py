"""Distributed exact-length DFT primitives (parallel.distributed_fft)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio_raytracing_studio_tpu.parallel import distributed_fft as dfft
from audio_raytracing_studio_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def block_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh(data=1, block=8)


def test_modsq_exact_against_python_ints():
    js = np.array([0, 1, 2, 32767, 32768, 123456789, (1 << 30) - 1], np.int32)
    for modulus in (7, 48000 * 2, (1 << 31) - 1, 2 * 346809):
        got = np.asarray(dfft._modsq(jnp.asarray(js), modulus))
        want = [(int(j) * int(j)) % modulus for j in js]
        assert got.tolist() == want, modulus


def test_dist_fft_matches_numpy(block_mesh):
    D = 8
    rng = np.random.default_rng(2)
    b_m = 256
    m = D * b_m
    x = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex64)

    def f(xb):
        return dfft.dist_fft(xb, "block", D)

    X_str = np.asarray(
        jax.shard_map(f, mesh=block_mesh, in_specs=P("block"),
                      out_specs=P("block"), check_vma=False)(jnp.asarray(x))
    )
    # device c holds bins c + D·t → de-stride
    X = np.zeros(m, np.complex64)
    for c in range(D):
        X[c::D] = X_str[c * b_m : (c + 1) * b_m]
    ref = np.fft.fft(x.astype(np.complex128))
    assert np.abs(X - ref).max() / np.abs(ref).max() < 1e-6


def test_dist_fft_ifft_roundtrip(block_mesh):
    D = 8
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)

    def f(xb):
        return dfft.dist_ifft(dfft.dist_fft(xb, "block", D), "block", D)

    y = np.asarray(
        jax.shard_map(f, mesh=block_mesh, in_specs=P("block"),
                      out_specs=P("block"), check_vma=False)(jnp.asarray(x))
    )
    assert np.abs(y - x).max() < 1e-5


def test_dist_dft_exact_matches_numpy(block_mesh):
    D = 8
    rng = np.random.default_rng(4)
    for n0 in (1000, 3658):
        b_sig = dfft.block_len_for(n0, D)
        x = np.zeros(b_sig * D, np.float32)
        x[:n0] = rng.standard_normal(n0).astype(np.float32) * 0.3

        def fwd(xb):
            return dfft.dist_dft_exact(xb.astype(jnp.complex64), n0, "block", D)

        X = np.asarray(
            jax.shard_map(fwd, mesh=block_mesh, in_specs=P("block"),
                          out_specs=P("block"), check_vma=False)(jnp.asarray(x))
        )
        ref = np.fft.fft(x[:n0].astype(np.float64))
        assert np.abs(X[:n0] - ref).max() / np.abs(ref).max() < 2e-6
        assert np.abs(X[n0:]).max() == 0.0  # padding stays clean


def test_band_edges_match_rfftfreq_masks():
    """The sharded EQ's host band edges must replicate the single-device
    rfftfreq masks bit-for-bit — bins can land exactly on a cutoff with
    float dust (e.g. 250.00000000000003 Hz at 44.1 kHz, n0 = k·2646)."""
    rng = np.random.default_rng(6)
    cases = [(44100, 2646 * k) for k in (1, 7, 100, 1167)]  # 250 Hz edge bins
    cases += [(44100, 441 * k) for k in (10, 70, 700)]
    cases += [(48000, 192 * k) for k in (1, 125, 1000)]  # exact edges at 48 k
    cases += [
        (int(rate), int(n0))
        for rate in (8000, 16000, 22050, 44100, 48000, 96000)
        for n0 in rng.integers(16, 500_000, size=8)
    ]
    for rate, n0 in cases:
        freqs = np.fft.rfftfreq(n0, d=1.0 / rate)
        bass_ref = (freqs > 1e-6) & (freqs <= 250.0)
        treble_ref = freqs >= 4000.0
        k_lo, k_bass, k_treble = dfft._band_edges(n0, rate)
        k = np.arange(freqs.size)
        bass = (k >= k_lo) & (k <= k_bass)
        treble = k >= k_treble
        assert (bass == bass_ref).all(), (rate, n0)
        assert (treble == treble_ref).all(), (rate, n0)


def test_shelf_eq_sharded_matches_exact(block_mesh):
    D = 8
    rng = np.random.default_rng(5)
    n0 = 24001
    rate = 8000
    b_sig = dfft.block_len_for(n0, D)
    x = np.zeros(b_sig * D, np.float32)
    x[:n0] = rng.standard_normal(n0).astype(np.float32) * 0.3

    def geq(xb):
        return dfft.shelf_eq_sharded(
            xb, rate, jnp.float32(1.6), jnp.float32(0.6), n0, "block", D
        )

    y = np.asarray(
        jax.shard_map(geq, mesh=block_mesh, in_specs=P("block"),
                      out_specs=P("block"), check_vma=False)(jnp.asarray(x))
    )[:n0]
    freqs = np.fft.rfftfreq(n0, d=1.0 / rate)
    g = np.ones_like(freqs)
    g[(freqs > 1e-6) & (freqs <= 250.0)] = 1.6
    g[freqs >= 4000.0] = 0.6
    ref = np.fft.irfft(np.fft.rfft(x[:n0].astype(np.float64)) * g, n0)
    assert np.abs(y - ref).max() < 3e-6
