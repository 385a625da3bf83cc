"""Fused Pallas RIR-bank kernel tests.

The production bank draws from the counter-based stream (ops.rng) — pure
uint32 VPU arithmetic, so the IDENTICAL randomness path runs under the CPU
interpreter and on TPU hardware: full numeric validation (vs the jnp
hash-draw path) happens right here in CI, block-grid and all.  The
injected-draws mode additionally pins the kernel math against the jnp path
given explicit draws (the oracle-parity strategy of the main pipeline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracing_studio_tpu.ops import ir_synth
from audio_raytracing_studio_tpu.ops.ir_synth_pallas import fused_rir_bank, pack_draws
from audio_raytracing_studio_tpu.params import (
    RenderParams,
    adjust_parameters_for_3d,
    compute_final_directionality_3d,
    derive_ir_geometry,
)


@pytest.fixture(scope="module")
def room_shape():
    p = RenderParams()
    rate = 16000  # small IR for interpreter speed
    dur, refs, maxd, split = adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)
    direc = compute_final_directionality_3d(
        p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
    )
    g = derive_ir_geometry(rate, dur, refs, maxd, p.material, direc, split, p.diffusion)
    return ir_synth.IRShape.from_geometry(g), ir_synth.IRScalars.from_geometry(g)


def make_draws(rng, shape, batch):
    """Per-entry explicit draws in both jnp-path and kernel layouts."""
    hi = max(2, shape.actual_max_early_delay)
    delays = rng.integers(1, hi, size=(batch, ir_synth.MAX_REFLECTIONS)).astype(np.int32)
    strengths = rng.uniform(0.3, 0.8, size=(batch, ir_synth.MAX_REFLECTIONS)).astype(np.float32)
    noise = rng.uniform(-1, 1, size=(batch, shape.late_length)).astype(np.float32)
    return delays, strengths, noise


class TestInjectedParity:
    """Kernel math vs the jnp synthesis path, identical draws (CPU interpret)."""

    def test_matches_jnp_path(self, rng, room_shape):
        shape, scalars = room_shape
        batch = 2
        delays, strengths, noise = make_draws(rng, shape, batch)

        early_k, late_k = fused_rir_bank(
            np.zeros(batch, np.int32), shape, scalars,
            interpret=True,
            injected_draws=pack_draws(shape, delays, strengths, noise),
        )
        early_k, late_k = np.asarray(early_k), np.asarray(late_k)

        for b in range(batch):
            e_j, l_j = ir_synth.synthesize(
                shape,
                jax.numpy.asarray(delays[b]),
                jax.numpy.asarray(strengths[b]),
                jax.numpy.asarray(noise[b]),
                scalars,
            )
            np.testing.assert_allclose(early_k[b], np.asarray(e_j), atol=3e-6)
            np.testing.assert_allclose(late_k[b], np.asarray(l_j), atol=3e-6)

    def test_tile_boundary_smoothing_no_wrap(self, rng):
        """Pad headroom smaller than the smoothing half-window must not
        wrap tail noise back into the valid region (regression: at
        split_point=1 and length=4096 — an exact tile multiple, zero
        headroom — the unmasked roll measured 0.30 max-abs vs jnp)."""
        rate = 16000
        g = derive_ir_geometry(
            rate, 4096 / rate, 25, 0.06, "Holz", 0.5, 1.0 / rate, 0.5
        )
        shape = ir_synth.IRShape.from_geometry(g)
        scalars = ir_synth.IRScalars.from_geometry(g)
        assert shape.length == 4096 and shape.split_point == 1
        assert shape.noise_smooth_width > 1
        delays, strengths, noise = make_draws(rng, shape, 1)
        early_k, late_k = fused_rir_bank(
            np.zeros(1, np.int32), shape, scalars,
            interpret=True,
            injected_draws=pack_draws(shape, delays, strengths, noise),
        )
        e_j, l_j = ir_synth.synthesize(
            shape,
            jnp.asarray(delays[0]),
            jnp.asarray(strengths[0]),
            jnp.asarray(noise[0]),
            scalars,
        )
        np.testing.assert_allclose(np.asarray(early_k)[0], np.asarray(e_j), atol=3e-6)
        np.testing.assert_allclose(np.asarray(late_k)[0], np.asarray(l_j), atol=3e-6)

    def test_norms_and_structure(self, rng, room_shape):
        shape, scalars = room_shape
        delays, strengths, noise = make_draws(rng, shape, 1)
        early, late = fused_rir_bank(
            np.zeros(1, np.int32), shape, scalars,
            interpret=True,
            injected_draws=pack_draws(shape, delays, strengths, noise),
        )
        early, late = np.asarray(early)[0], np.asarray(late)[0]
        assert np.max(np.abs(early)) == pytest.approx(0.9, abs=1e-4)
        assert np.max(np.abs(late)) == pytest.approx(0.7, abs=1e-4)
        assert early[0] == 0.0
        assert not np.any(early[shape.split_point :])
        assert not np.any(late[: shape.split_point])

    def test_tail_decays(self, rng, room_shape):
        shape, scalars = room_shape
        delays, strengths, noise = make_draws(rng, shape, 1)
        _, late = fused_rir_bank(
            np.zeros(1, np.int32), shape, scalars,
            interpret=True,
            injected_draws=pack_draws(shape, delays, strengths, noise),
        )
        late = np.asarray(late)[0]
        head = np.max(np.abs(late[shape.split_point : shape.split_point + 100]))
        tail = np.max(np.abs(late[-1600:]))
        assert tail < head * 0.1


class TestHashPath:
    """Production path (counter-based on-core draws) under the interpreter:
    full numeric parity vs the jnp hash-draw path — the SAME code runs on
    hardware, so this is the real randomness path, not an emulation."""

    def test_matches_jnp_hash_path(self, room_shape):
        shape, scalars = room_shape
        seeds = np.array([5, 6], np.int32)
        e_k, l_k = map(
            np.asarray, fused_rir_bank(seeds, shape, scalars, interpret=True)
        )
        assert e_k.shape == (2, shape.length)
        for i, s in enumerate(seeds):
            d, st, nz = ir_synth.hash_draws(int(s), shape)
            e_j, l_j = ir_synth.synthesize(shape, d, st, nz, scalars)
            np.testing.assert_allclose(e_k[i], np.asarray(e_j), atol=1e-6)
            np.testing.assert_allclose(l_k[i], np.asarray(l_j), atol=1e-6)

    def test_seed_sensitivity_norms_structure(self, room_shape):
        shape, scalars = room_shape
        e, l = map(
            np.asarray,
            fused_rir_bank(np.arange(4, dtype=np.int32), shape, scalars, interpret=True),
        )
        assert not np.array_equal(e[0], e[1])
        assert not np.array_equal(l[0], l[1])
        for b in range(4):
            assert np.max(np.abs(e[b])) == pytest.approx(0.9, abs=1e-4)
            assert np.max(np.abs(l[b])) == pytest.approx(0.7, abs=1e-4)
        assert not np.any(e[:, shape.split_point :])
        assert not np.any(l[:, : shape.split_point])

    def test_determinism(self, room_shape):
        shape, scalars = room_shape
        e1, l1 = fused_rir_bank(np.array([9]), shape, scalars, interpret=True)
        e2, l2 = fused_rir_bank(np.array([9]), shape, scalars, interpret=True)
        assert np.array_equal(np.asarray(e1), np.asarray(e2))
        assert np.array_equal(np.asarray(l1), np.asarray(l2))

    def test_long_ir_multiblock(self):
        """Cathedral at room_size=600 (≈ 7.2 s, 11 column blocks, past the
        old 2^18 VMEM ceiling) matches the jnp path — VERDICT item 2."""
        from audio_raytracing_studio_tpu.ops.ir_synth_pallas import BLOCK_FLAT

        p = RenderParams(hall_type="Cathedral", room_size=600.0)
        rate = 48000
        dur, refs, maxd, split = adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)
        direc = compute_final_directionality_3d(
            p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
        )
        g = derive_ir_geometry(rate, dur, refs, maxd, p.material, direc, split, p.diffusion)
        shape = ir_synth.IRShape.from_geometry(g)
        scalars = ir_synth.IRScalars.from_geometry(g)
        assert shape.length > (1 << 18)  # beyond the old single-program cap
        assert -(-shape.length // BLOCK_FLAT) > 1

        e_k, l_k = map(
            np.asarray,
            fused_rir_bank(np.array([42], np.int32), shape, scalars, interpret=True),
        )
        d, st, nz = ir_synth.hash_draws(42, shape)
        e_j, l_j = ir_synth.synthesize(shape, d, st, nz, scalars)
        np.testing.assert_allclose(e_k[0], np.asarray(e_j), atol=1e-6)
        np.testing.assert_allclose(l_k[0], np.asarray(l_j), atol=1e-6)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled-kernel check needs TPU"
)
class TestHashPathHardware:
    """Same assertions as TestHashPath but compiled by Mosaic on the chip —
    guards against interpreter/hardware divergence."""

    def test_matches_jnp_hash_path_on_chip(self, room_shape):
        shape, scalars = room_shape
        e_k, l_k = map(np.asarray, fused_rir_bank(np.array([5]), shape, scalars))
        d, st, nz = ir_synth.hash_draws(5, shape)
        e_j, l_j = ir_synth.synthesize(shape, d, st, nz, scalars)
        np.testing.assert_allclose(e_k[0], np.asarray(e_j), atol=1e-5)
        np.testing.assert_allclose(l_k[0], np.asarray(l_j), atol=1e-5)


def test_render_batch_pallas_backend(rng, room_shape):
    """End-to-end batched render with the Pallas RIR bank (interpret on CPU)."""
    from unittest import mock

    from audio_raytracing_studio_tpu.ops import ir_synth_pallas
    from audio_raytracing_studio_tpu.parallel import sharding

    rate = 16000
    t = np.arange(rate // 4) / rate
    clips = np.stack(
        [(0.4 * np.sin(2 * np.pi * (220 + 40 * i) * t)).astype(np.float32) for i in range(2)]
    )
    p = RenderParams(target_layout="Stereo")

    original = ir_synth_pallas.fused_rir_bank

    def interpreted(seeds, shape, scalars, interpret=False, injected_draws=None):
        return original(seeds, shape, scalars, interpret=True, injected_draws=injected_draws)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        out = sharding.render_batch(clips, rate, p, seeds=[1, 2], ir_backend="pallas")
    assert out.shape[0] == 2 and out.shape[2] == 2
    assert np.max(np.abs(out)) <= 1.0 + 1e-5


def test_render_batch_pallas_sharded(rng, room_shape):
    """Pallas bank under shard_map over the data axis (4 virtual devices)."""
    from unittest import mock

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from audio_raytracing_studio_tpu.ops import ir_synth_pallas
    from audio_raytracing_studio_tpu.parallel import mesh as meshlib
    from audio_raytracing_studio_tpu.parallel import sharding

    rate = 16000
    t = np.arange(rate // 4) / rate
    clips = np.stack(
        [(0.4 * np.sin(2 * np.pi * (200 + 30 * i) * t)).astype(np.float32) for i in range(8)]
    )
    p = RenderParams(target_layout="Stereo")
    m = meshlib.make_mesh(data=4, block=1, devices=jax.devices()[:4])

    original = ir_synth_pallas.fused_rir_bank

    def interpreted(seeds, shape, scalars, interpret=False, injected_draws=None):
        return original(seeds, shape, scalars, interpret=True, injected_draws=injected_draws)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        out, metrics = sharding.render_batch(
            clips, rate, p, device_mesh=m, ir_backend="pallas", with_metrics=True
        )
    assert out.shape[0] == 8 and out.shape[2] == 2
    assert len(metrics) == 8
    assert np.max(np.abs(out)) <= 1.0 + 1e-5


def test_render_batch_pallas_sharded_full_matrix(rng, room_shape):
    """Round-4 VERDICT item 4: pcm16_output + clip_lengths (masked meter +
    length-dynamic exact EQ for padded EQ-on clips) on the shard_map Pallas
    path — the option matrix the jnp path already had."""
    from unittest import mock

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from audio_raytracing_studio_tpu.ops import ir_synth_pallas
    from audio_raytracing_studio_tpu.parallel import mesh as meshlib
    from audio_raytracing_studio_tpu.parallel import sharding

    rate = 16000
    t = np.arange(rate // 2) / rate
    clips = np.stack(
        [(0.4 * np.sin(2 * np.pi * (200 + 30 * i) * t)).astype(np.float32)
         for i in range(4)]
    )
    p_eq = RenderParams(
        target_layout="Stereo", bass_gain=1.8, treble_gain=0.5
    )
    p_flat = RenderParams(target_layout="Stereo")
    params = [p_eq, p_eq, p_flat, p_flat]
    true_lens = [clips.shape[1], clips.shape[1] - 999, clips.shape[1] - 555,
                 clips.shape[1]]
    for b, tl in enumerate(true_lens):
        clips[b, tl:] = 0.0  # bucket padding is zeros by contract
    m = meshlib.make_mesh(data=4, block=1, devices=jax.devices()[:4])

    original = ir_synth_pallas.fused_rir_bank

    def interpreted(seeds, shape, scalars, interpret=False, injected_draws=None):
        return original(seeds, shape, scalars, interpret=True, injected_draws=injected_draws)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        q, metrics = sharding.render_batch(
            clips, rate, params, seeds=[0, 1, 2, 3], device_mesh=m,
            ir_backend="pallas", with_metrics=True, pcm16_output=True,
            clip_lengths=true_lens,
        )
        # reference: the SAME options on the meshless jnp path (same
        # counter-based seed stream → ~2e-5 float agreement → ±2 LSBs)
        want, want_metrics = sharding.render_batch(
            clips, rate, params, seeds=[0, 1, 2, 3],
            with_metrics=True, pcm16_output=True, clip_lengths=true_lens,
        )
    assert q.dtype == np.int16 and q.shape == want.shape
    assert np.max(np.abs(q.astype(np.int32) - want.astype(np.int32))) <= 2
    for got, ref in zip(metrics, want_metrics):
        for key in ("lufs", "rms_dbfs", "true_peak_dbfs"):
            assert got[key] == pytest.approx(ref[key], abs=0.02), key


def test_injected_bank_rejects_oversized_ir(room_shape):
    """Only the injected-draws (whole-IR-per-program) kernel has a VMEM cap;
    the production block-grid path has none."""
    from audio_raytracing_studio_tpu.ops import ir_synth_pallas as irp

    shape, scalars = room_shape
    big = shape._replace(length=irp.MAX_BANK_IR_LENGTH + 1024)
    fake = (
        np.zeros((1, irp.SUBLANE, irp.LANE), np.int32),
        np.zeros((1, irp.SUBLANE, irp.LANE), np.float32),
        np.zeros((1, irp.SUBLANE, 8), np.float32),
    )
    with pytest.raises(ValueError, match="VMEM"):
        irp.fused_rir_bank(
            np.zeros(1, np.int32), big, scalars, interpret=False, injected_draws=fake
        )


def test_backends_agree_for_same_seed(rng):
    """VERDICT item 10: the SAME seed renders the SAME audio on the jnp and
    Pallas IR backends (counter-based stream, PARITY.md seed streams v2)."""
    from unittest import mock

    from audio_raytracing_studio_tpu.ops import ir_synth_pallas
    from audio_raytracing_studio_tpu.parallel import sharding

    rate = 16000
    t = np.arange(rate // 4) / rate
    clips = np.stack(
        [(0.4 * np.sin(2 * np.pi * (220 + 40 * i) * t)).astype(np.float32) for i in range(2)]
    )
    p = RenderParams(target_layout="Stereo")

    out_jnp = sharding.render_batch(clips, rate, p, seeds=[7, 8], ir_backend="jnp")

    original = ir_synth_pallas.fused_rir_bank

    def interpreted(seeds, shape, scalars, interpret=False, injected_draws=None):
        return original(seeds, shape, scalars, interpret=True, injected_draws=injected_draws)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        out_pal = sharding.render_batch(clips, rate, p, seeds=[7, 8], ir_backend="pallas")

    np.testing.assert_allclose(out_pal, out_jnp, atol=2e-5)


class TestFinalizeVarianceRobustness:
    """Round-3 VERDICT item 7: the bank's variance restore must survive a
    large-mean signal.  The per-block stats are now (sum, centered-M2, n)
    combined with Chan's formula; the old sumsq/n − mean² form loses the
    variance entirely in float32 when mean² ≫ var."""

    @staticmethod
    def _case(mean, std, n_blocks=8, block=32768, seed=0):
        rng_local = np.random.default_rng(seed)
        data = (mean + std * rng_local.standard_normal(n_blocks * block)).astype(
            np.float32
        )
        blocks = data.reshape(n_blocks, block)
        return data, blocks

    def test_chan_combination_matches_float64(self):
        from audio_raytracing_studio_tpu.ops.ir_synth_pallas import (
            _N_STATS,
            _finalize_bank,
        )
        from audio_raytracing_studio_tpu.ops.ir_synth import IRShape

        mean, std = 100.0, 0.01  # mean² / var = 1e8 — f32 sumsq is hopeless
        data, blocks = self._case(mean, std)
        n_blocks, block = blocks.shape
        n = data.size

        # per-block stats exactly as the production kernel computes them
        stats = np.zeros((1, n_blocks, _N_STATS), np.float32)
        for i, b in enumerate(blocks):
            b32 = b.astype(np.float32)
            s = np.float32(b32.sum(dtype=np.float32))
            m = s / np.float32(block)
            stats[0, i, 0] = s
            stats[0, i, 1] = np.square(b32 - m, dtype=np.float32).sum(
                dtype=np.float32
            )
            # slots 2/3: "smoothed" = data scaled by 0.5 → std ratio must be 2
            h = (0.5 * b32).astype(np.float32)
            hs = np.float32(h.sum(dtype=np.float32))
            stats[0, i, 2] = hs
            stats[0, i, 3] = np.square(h - hs / np.float32(block),
                                       dtype=np.float32).sum(dtype=np.float32)
            stats[0, i, 5] = np.abs(h).max()
            stats[0, i, 6] = block

        shape = IRShape(
            length=n + 1, split_point=1, actual_max_early_delay=1,
            reflection_count=0, late_length=n, noise_smooth_width=5,
            early_taps_active=False,
        )
        late_raw = jnp.asarray(np.ones((1, 1, 1), np.float32))
        early_raw = jnp.asarray(np.zeros((1, 1, 1), np.float32))
        _early, late = _finalize_bank(early_raw, late_raw, jnp.asarray(stats), shape)

        # float64 truth: c = std(data)/std(0.5·data) = 2; late peak = mean/2·…
        c_true = np.std(data.astype(np.float64)) / np.std(0.5 * data.astype(np.float64))
        max_t = float(stats[0, :, 5].max())
        expected = c_true * (0.7 / (max_t * c_true))  # LATE_NORM_PEAK fold
        got = float(late[0, 0, 0])
        assert got == pytest.approx(expected, rel=1e-3)

        # the old raw-sumsq formula demonstrably fails on the same data:
        # f32 sumsq/n − mean² collapses to garbage (or 0) at mean=100, std=0.01
        sumsq_raw = np.square(blocks.astype(np.float32)).sum(axis=1, dtype=np.float32)
        var_old = float(sumsq_raw.sum(dtype=np.float32) / n
                        - (float(stats[0, :, 0].sum()) / n) ** 2)
        var_true = float(np.var(data.astype(np.float64)))
        assert not np.isclose(var_old, var_true, rtol=0.5)  # old form is broken

    def test_zero_mean_unchanged(self):
        """The production regime (zero-mean noise) keeps the same numbers."""
        from audio_raytracing_studio_tpu.ops.ir_synth_pallas import (
            _N_STATS,
            _finalize_bank,
        )
        from audio_raytracing_studio_tpu.ops.ir_synth import IRShape

        data, blocks = self._case(0.0, 1.0, n_blocks=4, block=4096, seed=7)
        n_blocks, block = blocks.shape
        n = data.size
        stats = np.zeros((1, n_blocks, _N_STATS), np.float32)
        for i, b in enumerate(blocks):
            s = np.float32(b.sum(dtype=np.float32))
            stats[0, i, 0] = s
            stats[0, i, 1] = np.square(b - s / block, dtype=np.float32).sum(
                dtype=np.float32
            )
            h = (0.25 * b).astype(np.float32)
            hs = np.float32(h.sum(dtype=np.float32))
            stats[0, i, 2] = hs
            stats[0, i, 3] = np.square(h - hs / block, dtype=np.float32).sum(
                dtype=np.float32
            )
            stats[0, i, 5] = np.abs(h).max()
            stats[0, i, 6] = block
        shape = IRShape(
            length=n + 1, split_point=1, actual_max_early_delay=1,
            reflection_count=0, late_length=n, noise_smooth_width=5,
            early_taps_active=False,
        )
        _early, late = _finalize_bank(
            jnp.zeros((1, 1, 1), jnp.float32),
            jnp.ones((1, 1, 1), jnp.float32),
            jnp.asarray(stats), shape,
        )
        c_true = np.std(data.astype(np.float64)) / np.std(
            0.25 * data.astype(np.float64)
        )
        max_t = float(stats[0, :, 5].max())
        expected = c_true * (0.7 / (max_t * c_true))
        assert float(late[0, 0, 0]) == pytest.approx(expected, rel=1e-4)
