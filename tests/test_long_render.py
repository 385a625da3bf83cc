"""Sequence-parallel long-clip render vs the single-device pipeline."""

import jax
import numpy as np
import pytest

from audio_raytracing_studio_tpu.models import pipeline
from audio_raytracing_studio_tpu.parallel import long_render, mesh as meshlib
from audio_raytracing_studio_tpu.params import RenderParams


@pytest.fixture(scope="module")
def block_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh(data=1, block=8)


def clip(rng, seconds, rate):
    t = np.arange(int(seconds * rate)) / rate
    return (0.4 * np.sin(2 * np.pi * 330 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


class TestRenderLong:
    def test_matches_single_device_air_off(self, rng, block_mesh):
        rate = 16000
        x = clip(rng, 1.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.0)
        long = long_render.render_long(x, rate, p, block_mesh, seed=3)
        single = pipeline.render(x, rate, p, seed=3)
        assert long.shape == single.shape
        assert np.max(np.abs(long - single)) < 2e-4

    def test_matches_single_device_with_air(self, rng, block_mesh):
        rate = 16000
        x = clip(rng, 1.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.6)
        long = long_render.render_long(x, rate, p, block_mesh, seed=3)
        exact = pipeline.render(x, rate, p, seed=3, fast_filters=False)
        # block-grid air gain vs exact-length circular filter: ≤1e-3 contract
        assert np.max(np.abs(long - exact)) < 1e-3

    def test_layouts_with_cross_block_delays(self, rng, block_mesh):
        rate = 16000
        x = clip(rng, 0.8, rate)
        for layout in ("5.1 (Standard)", "7.1 (Surround)", "5.1.2 (Atmos Light)"):
            p = RenderParams(target_layout=layout, room_size=60.0,
                             air_absorption=0.0, z_pos=0.7)
            long = long_render.render_long(x, rate, p, block_mesh, seed=1)
            single = pipeline.render(x, rate, p, seed=1)
            assert long.shape == single.shape
            assert np.max(np.abs(long - single)) < 2e-4, layout

    def test_eq_matches_single_device_exact(self, rng, block_mesh):
        """VERDICT item 3: non-unity shelf EQ in long mode via the
        distributed exact-length transform matches the single-device exact
        render within the 1e-3 contract (bass 1.6 / treble 0.6)."""
        rate = 16000
        x = clip(rng, 1.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0,
                         air_absorption=0.0, bass_gain=1.6, treble_gain=0.6)
        long = long_render.render_long(x, rate, p, block_mesh, seed=3)
        exact = pipeline.render(x, rate, p, seed=3, fast_filters=False)
        assert long.shape == exact.shape
        assert np.max(np.abs(long - exact)) < 1e-3
        # the EQ visibly acted (non-trivial vs unity-gain render)
        p_unity = RenderParams(target_layout="Stereo", room_size=60.0,
                               air_absorption=0.0)
        unity = long_render.render_long(x, rate, p_unity, block_mesh, seed=3)
        assert np.max(np.abs(long - unity)) > 1e-3

    def test_eq_with_air_and_surround(self, rng, block_mesh):
        """EQ composed with fast-air and cross-block layout delays."""
        rate = 16000
        x = clip(rng, 0.8, rate)
        p = RenderParams(target_layout="7.1 (Surround)", room_size=60.0,
                         air_absorption=0.5, bass_gain=2.5, treble_gain=0.4,
                         z_pos=0.7)
        long = long_render.render_long(x, rate, p, block_mesh, seed=1)
        exact = pipeline.render(x, rate, p, seed=1, fast_filters=False)
        assert long.shape == exact.shape
        assert np.max(np.abs(long - exact)) < 1e-3

    def test_eq_external_ir_long(self, rng, block_mesh):
        rate = 16000
        x = clip(rng, 0.8, rate)
        ir = (rng.standard_normal((700, 2)) * 0.2).astype(np.float32)
        p = RenderParams(use_external_ir=True, target_layout="Stereo",
                         dry_wet=0.7, bass_gain=0.5, treble_gain=1.8)
        long = long_render.render_long(x, rate, p, block_mesh, external_ir=ir)
        single = pipeline.render(x, rate, p, external_ir=ir)
        assert long.shape == single.shape
        assert np.max(np.abs(long - single)) < 1e-3

    def test_eq_requires_pow2_blocks(self, rng):
        if len(jax.devices()) < 3:
            pytest.skip("needs 3 devices")
        rate = 16000
        x = clip(rng, 0.3, rate)
        m = meshlib.make_mesh(data=1, block=3, devices=jax.devices()[:3])
        p = RenderParams(target_layout="Stereo", bass_gain=2.0)
        with pytest.raises(ValueError, match="power-of-two"):
            long_render.render_long(x, rate, p, m)

    def test_external_ir_long(self, rng, block_mesh):
        rate = 16000
        x = clip(rng, 0.8, rate)
        ir = (rng.standard_normal((700, 2)) * 0.2).astype(np.float32)
        p = RenderParams(use_external_ir=True, target_layout="Stereo", dry_wet=0.7)
        long = long_render.render_long(x, rate, p, block_mesh, external_ir=ir)
        single = pipeline.render(x, rate, p, external_ir=ir)
        assert long.shape == single.shape
        assert np.max(np.abs(long - single)) < 2e-4

    def test_sharded_metrics_match_single_device_meter(self, rng, block_mesh):
        """Cross-shard gated LUFS / peak / RMS vs the single-device meter."""
        import jax.numpy as jnp
        from audio_raytracing_studio_tpu.metering import loudness as jl

        rate = 16000
        x = clip(rng, 2.0, rate)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.0)
        out, metrics = long_render.render_long(
            x, rate, p, block_mesh, seed=3, with_metrics=True
        )
        ref = jl.audio_metrics(jnp.asarray(out.T), rate)
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)
        assert metrics["true_peak_dbfs"] == pytest.approx(float(ref["true_peak_dbfs"]), abs=1e-3)
        assert metrics["rms_dbfs"] == pytest.approx(float(ref["rms_dbfs"]), abs=1e-3)

    def test_sharded_metrics_silence(self, block_mesh):
        rate = 16000
        x = np.zeros(rate, np.float32)
        p = RenderParams(target_layout="Stereo", room_size=60.0, air_absorption=0.0)
        out, metrics = long_render.render_long(
            x, rate, p, block_mesh, with_metrics=True
        )
        assert metrics["lufs"] == float("-inf")
        assert metrics["true_peak_dbfs"] == float("-inf")


class TestRenderScale:
    def test_render_scale_60s_48k_eq_metrics(self, rng, block_mesh):
        """Round-3 VERDICT item 5: the sharded stack at a REAL render shape.

        60 s @ 48 kHz sharded 8 ways — the distributed exact-length Bluestein
        EQ (n0 ≈ 2.96M, int32-modular chirps), ring overlap-add conv, and the
        block-sharded BS.1770 meter all at a scale where layout/precision
        surprises live (the batched 3·2^k mis-tiling was invisible at small
        shapes).  ≤1e-3 vs the single-device exact render; ~2-3 min on the
        8-virtual-device CPU mesh (the suite's designated slow test).
        """
        import jax.numpy as jnp
        from audio_raytracing_studio_tpu.metering import loudness as jl

        rate = 48000
        x = clip(rng, 60.0, rate)
        p = RenderParams(target_layout="5.1 (Standard)", room_size=120.0,
                         bass_gain=1.6, treble_gain=0.7)
        long, metrics = long_render.render_long(
            x, rate, p, block_mesh, seed=3, with_metrics=True
        )
        exact = pipeline.render(x, rate, p, seed=3, fast_filters=False)
        assert long.shape == exact.shape
        assert long.shape[0] > 2_900_000  # genuinely render-scale
        assert np.max(np.abs(long - exact)) < 1e-3
        ref = jl.audio_metrics(jnp.asarray(long.T), rate)
        assert metrics["lufs"] == pytest.approx(float(ref["lufs"]), abs=0.02)
        assert metrics["rms_dbfs"] == pytest.approx(float(ref["rms_dbfs"]), abs=1e-3)
