"""Fused Pallas RIR-bank kernel — structural/distributional validation in
interpreter mode (SURVEY §4: TPU-only kernels run under interpret=True in CI)."""

import numpy as np
import pytest

from audio_raytracing_studio_tpu.ops import ir_synth
from audio_raytracing_studio_tpu.ops.ir_synth_pallas import fused_rir_bank
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


def test_bank_shapes_and_norms(room_shape):
    shape, scalars = room_shape
    early, late = fused_rir_bank(np.arange(3), shape, scalars, interpret=True)
    early, late = np.asarray(early), np.asarray(late)
    assert early.shape == (3, shape.length) and late.shape == (3, shape.length)
    for b in range(3):
        assert np.max(np.abs(early[b])) == pytest.approx(0.9, abs=1e-4)
        assert np.max(np.abs(late[b])) == pytest.approx(0.7, abs=1e-4)
        assert early[b, 0] == 0.0
        assert not np.any(early[b, shape.split_point :])  # taps before split
        assert not np.any(late[b, : shape.split_point])  # tail after split


def test_bank_deterministic(room_shape):
    shape, scalars = room_shape
    e1, l1 = fused_rir_bank(np.array([5, 6]), shape, scalars, interpret=True)
    e2, l2 = fused_rir_bank(np.array([5, 6]), shape, scalars, interpret=True)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    # NOTE: seed-sensitivity (different seeds → different IRs) cannot be
    # asserted here — the CPU Pallas interpreter ignores prng_seed values.
    # It is verified on real TPU hardware (see the smoke run in bench/CI).


def test_bank_tail_decays(room_shape):
    shape, scalars = room_shape
    _, late = fused_rir_bank(np.array([1]), shape, scalars, interpret=True)
    late = np.asarray(late)[0]
    head = np.max(np.abs(late[shape.split_point : shape.split_point + 1600]))
    tail = np.max(np.abs(late[-1600:]))
    assert tail < head * 0.1


def test_bank_early_tap_statistics(room_shape):
    """Tap positions live in [1, actual_max_early_delay); counts ≤ budget."""
    shape, scalars = room_shape
    early, _ = fused_rir_bank(np.arange(8), shape, scalars, interpret=True)
    early = np.asarray(early)
    for b in range(8):
        nz = np.nonzero(early[b])[0]
        assert len(nz) >= 1
        assert nz.min() >= 1
        assert nz.max() < shape.actual_max_early_delay
        assert len(nz) <= shape.reflection_count


def test_bank_matches_reference_spectrum_statistics(room_shape):
    """Late tail envelope follows the same decay law as the jnp path."""
    shape, scalars = room_shape
    _, late_bank = fused_rir_bank(np.array([3]), shape, scalars, interpret=True)
    late_bank = np.asarray(late_bank)[0]

    import jax

    delays, strengths, noise = ir_synth.sample_draws(jax.random.PRNGKey(3), shape)
    _, late_jnp = ir_synth.synthesize(shape, delays, strengths, noise, scalars)
    late_jnp = np.asarray(late_jnp)

    # same RMS decay profile per segment (different RNG streams → loose rel)
    seg = (shape.length - shape.split_point) // 4
    for s in range(4):
        lo = shape.split_point + s * seg
        a = np.sqrt(np.mean(late_bank[lo : lo + seg] ** 2))
        b = np.sqrt(np.mean(late_jnp[lo : lo + seg] ** 2))
        assert a == pytest.approx(b, rel=0.5)


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

    def interpreted(seeds, shape, scalars, interpret=False):
        return original(seeds, shape, scalars, interpret=True)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        out = sharding.render_batch(clips, rate, p, seeds=[1, 2], ir_backend="pallas")
    assert out.shape[0] == 2 and out.shape[2] == 2
    assert np.max(np.abs(out)) <= 1.0 + 1e-5
    assert np.max(np.abs(out)) > 0.01


def test_render_batch_pallas_sharded(rng, room_shape):
    """Pallas bank under shard_map over the data axis (4 virtual devices)."""
    import jax
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

    def interpreted(seeds, shape, scalars, interpret=False):
        return original(seeds, shape, scalars, interpret=True)

    with mock.patch.object(ir_synth_pallas, "fused_rir_bank", interpreted):
        out, metrics = sharding.render_batch(
            clips, rate, p, device_mesh=m, ir_backend="pallas", with_metrics=True
        )
    assert out.shape[0] == 8 and out.shape[2] == 2
    assert len(metrics) == 8
    assert np.max(np.abs(out)) <= 1.0 + 1e-5
