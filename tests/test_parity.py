"""Golden parity: JAX pipeline vs the seeded NumPy oracle, ≤1e-3 max-abs
(BASELINE.json contract) on the five baseline configurations, with identical
injected random draws.  Runs on the CPU backend (conftest)."""

import numpy as np
import pytest

from audio_raytracing_studio_tpu import config
from audio_raytracing_studio_tpu.models import pipeline
from audio_raytracing_studio_tpu.oracle import dsp
from audio_raytracing_studio_tpu.params import (
    IRDraws,
    RenderParams,
    adjust_parameters_for_3d,
    compute_final_directionality_3d,
    derive_ir_geometry,
)

TOL = 1e-3


def geometry_for(p: RenderParams, rate: int):
    dur, refs, max_delay, split = adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)
    directionality = compute_final_directionality_3d(
        p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
    )
    return derive_ir_geometry(
        rate, dur, refs, max_delay, p.material, directionality, split, p.diffusion
    )


def draws_for(p: RenderParams, rate: int, seed=123):
    return IRDraws.sample(np.random.default_rng(seed), geometry_for(p, rate))


def assert_parity(p: RenderParams, tone, seed=123, external_ir=None, tol=TOL):
    x, rate = tone
    if p.use_external_ir:
        ours = pipeline.render(x, rate, p, external_ir=external_ir)
        ref = dsp.render(x, rate, p, external_ir=external_ir)
    else:
        d = draws_for(p, rate, seed)
        ours = pipeline.render(x, rate, p, draws=d)
        ref = dsp.render(x, rate, p, draws=d)
    assert ours.shape == ref.shape, f"{ours.shape} vs {ref.shape}"
    err = float(np.max(np.abs(ours - ref)))
    assert err <= tol, f"max-abs deviation {err:.2e} > {tol}"
    # PCM16 quantization contract: bit-comparable within 1 LSB
    q_ours = dsp.quantize_pcm16(ours)
    q_ref = dsp.quantize_pcm16(ref)
    lsb = int(np.max(np.abs(q_ours.astype(np.int32) - q_ref.astype(np.int32))))
    assert lsb <= max(1, int(np.ceil(tol * 32768))), f"PCM16 differs by {lsb} LSB"
    return err


class TestBaselineConfigParity:
    def test_config1_internal_room_mono_to_stereo(self, tone48k):
        """BASELINE config 1: internal Room reverb, mono 48 kHz → stereo."""
        x, rate = tone48k
        p = RenderParams(target_layout="Stereo")  # Room, Holz defaults
        assert_parity(p, (x, rate))

    def test_config2_external_ir_mix_kill_eq(self, rng, tone48k):
        """BASELINE config 2: external stereo IR + dry/wet + dry-kill + EQ."""
        x, rate = tone48k
        n_ir = 4800
        env = np.exp(-np.arange(n_ir) / 800.0)[:, None]
        ir = (rng.standard_normal((n_ir, 2)) * env * 0.3).astype(np.float32)
        ir[0] = 1.0
        p = RenderParams(
            use_external_ir=True,
            dry_wet=0.7,
            dry_wet_kill_start=0.4,
            bass_gain=1.6,
            treble_gain=0.6,
            target_layout="Stereo",
        )
        assert_parity(p, (x, rate), external_ir=ir)

    def test_config3_cathedral_large_air_diffusion(self, tone48k):
        """BASELINE config 3: Cathedral, large room, air absorption, diffusion."""
        x, rate = tone48k
        p = RenderParams(
            hall_type="Cathedral",
            room_size=600.0,
            air_absorption=0.5,
            diffusion=0.8,
            target_layout="Stereo",
        )
        assert_parity(p, (x, rate))

    def test_config4_3d_positioned_51(self, tone48k):
        """BASELINE config 4: 3D-positioned source → 5.1 bus."""
        x, rate = tone48k
        p = RenderParams(
            x_pos=0.2, y_pos=0.8, z_pos=0.3, target_layout="5.1 (Standard)"
        )
        assert_parity(p, (x, rate))

    def test_config5_71_and_512_layouts(self, tone48k):
        """BASELINE config 5: 7.1 and 5.1.2 renders (rear/height derivation)."""
        x, rate = tone48k
        for layout in ("7.1 (Surround)", "5.1.2 (Atmos Light)"):
            p = RenderParams(target_layout=layout, z_pos=0.7)
            assert_parity(p, (x, rate))


class TestParityEdgeCases:
    def test_plate_small_room(self, tone48k):
        x, rate = tone48k
        p = RenderParams(hall_type="Plate", room_size=10.0, target_layout="Stereo")
        assert_parity(p, (x, rate))

    def test_all_materials(self, tone48k):
        x, rate = tone48k
        for material in config.MATERIAL_ABSORPTION:
            p = RenderParams(material=material, target_layout="Stereo")
            assert_parity(p, (x, rate), seed=hash(material) % 2**31)

    def test_extreme_dry_wet(self, tone48k):
        x, rate = tone48k
        for dw in (0.0, 0.5, 0.55, 1.0):
            p = RenderParams(dry_wet=dw, target_layout="Stereo")
            assert_parity(p, (x, rate))

    def test_dry_kill_disabled(self, tone48k):
        x, rate = tone48k
        p = RenderParams(dry_wet=0.9, dry_wet_kill_start=1.0, target_layout="Stereo")
        assert_parity(p, (x, rate))

    def test_44100_rate(self, rng):
        rate = 44100
        t = np.arange(int(0.7 * rate)) / rate
        x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        p = RenderParams(target_layout="5.1 (Standard)")
        assert_parity(p, (x, rate))

    def test_stereo_input(self, rng, tone48k):
        x, rate = tone48k
        stereo = np.stack([x, np.roll(x, 100)], axis=1)
        p = RenderParams(target_layout="Stereo")
        assert_parity(p, (stereo, rate))

    def test_external_ir_resampled(self, rng, tone48k):
        x, rate = tone48k
        ir44 = (rng.standard_normal((2205, 2)) * 0.2).astype(np.float32)
        # pipeline resamples 44.1k IR to 48k; oracle receives the resampled IR
        ir48 = pipeline.prepare_external_ir(ir44, 44100, rate)
        p = RenderParams(use_external_ir=True, target_layout="Stereo")
        ours = pipeline.render(x, rate, p, external_ir=ir44, external_ir_rate=44100)
        ref = dsp.render(x, rate, p, external_ir=ir48)
        assert ours.shape == ref.shape
        assert np.max(np.abs(ours - ref)) <= TOL

    def test_external_ir_rejects_mono(self, tone48k):
        x, rate = tone48k
        p = RenderParams(use_external_ir=True)
        with pytest.raises(ValueError, match="stereo"):
            pipeline.render(x, rate, p, external_ir=np.zeros((100, 1), np.float32))


def test_injected_draws_over_budget_rejected(rng, tone48k):
    """derive_ir_geometry does not clip reflection_count (only the product
    path does, ref :224): a >80-tap injection must fail with a clear error
    on the pipeline side, not a NumPy broadcast crash."""
    from audio_raytracing_studio_tpu.params import IRDraws, derive_ir_geometry

    x, rate = tone48k
    g = derive_ir_geometry(rate, 0.5, 200, 0.06, "Holz", 0.5, 0.03, 0.5)
    draws = IRDraws.sample(rng, g)
    assert len(draws.delays) == 200
    with pytest.raises(ValueError, match="MAX_REFLECTIONS"):
        pipeline.render(x, rate, RenderParams(), draws=draws)


class TestDeterminism:
    def test_same_seed_same_output(self, tone48k):
        x, rate = tone48k
        p = RenderParams(target_layout="Stereo")
        a = pipeline.render(x, rate, p, seed=42)
        b = pipeline.render(x, rate, p, seed=42)
        assert np.array_equal(a, b)

    def test_different_seed_different_output(self, tone48k):
        x, rate = tone48k
        p = RenderParams(target_layout="Stereo")
        a = pipeline.render(x, rate, p, seed=1)
        b = pipeline.render(x, rate, p, seed=2)
        assert not np.array_equal(a, b)


class TestFastFilters:
    """fast_air mode: air gain on the conv grid — must stay inside 1e-3."""

    def test_fast_air_parity_config1(self, tone48k):
        x, rate = tone48k
        p = RenderParams(target_layout="Stereo")  # air 0.1 default
        d = draws_for(p, rate)
        fast = pipeline.render(x, rate, p, draws=d, fast_filters=True)
        ref = dsp.render(x, rate, p, draws=d)
        err = float(np.max(np.abs(fast - ref)))
        assert err <= TOL, f"fast-air deviation {err:.2e}"

    def test_fast_air_parity_heavy_absorption(self, tone48k):
        x, rate = tone48k
        p = RenderParams(
            hall_type="Cathedral", room_size=600.0, air_absorption=1.0,
            diffusion=0.8, target_layout="5.1 (Standard)",
        )
        d = draws_for(p, rate)
        fast = pipeline.render(x, rate, p, draws=d, fast_filters=True)
        ref = dsp.render(x, rate, p, draws=d)
        err = float(np.max(np.abs(fast - ref)))
        assert err <= TOL, f"fast-air deviation {err:.2e}"

    def test_fast_matches_exact_closely(self, tone48k):
        x, rate = tone48k
        p = RenderParams(target_layout="Stereo", air_absorption=0.6)
        d = draws_for(p, rate)
        fast = pipeline.render(x, rate, p, draws=d, fast_filters=True)
        exact = pipeline.render(x, rate, p, draws=d, fast_filters=False)
        assert float(np.max(np.abs(fast - exact))) <= 5e-4


class TestDegenerateEdges:
    def test_zero_levels_dry_only(self, tone48k):
        """early_level=late_level=0 → empty kernel set → pure scaled dry."""
        x, rate = tone48k
        p = RenderParams(early_level=0.0, late_level=0.0, target_layout="Stereo")
        assert_parity(p, (x, rate))

    def test_clip_shorter_than_ir(self, rng):
        rate = 48000
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4800) / rate)).astype(np.float32)
        p = RenderParams(target_layout="Stereo")  # IR 72000 >> clip 4800
        assert_parity(p, (x, rate))

    def test_8khz_rate(self, rng):
        rate = 8000
        x = (0.4 * np.sin(2 * np.pi * 200 * np.arange(rate) / rate)).astype(np.float32)
        p = RenderParams(target_layout="5.1 (Standard)")
        assert_parity(p, (x, rate))

    def test_silent_input(self):
        rate = 48000
        x = np.zeros(rate, np.float32)
        p = RenderParams(target_layout="Stereo")
        out, metrics = pipeline.render(x, rate, p, seed=1, return_metrics=True)
        assert not np.any(out)
        assert metrics["lufs"] == float("-inf")
        from audio_raytracing_studio_tpu.analysis.metrics import metrics_string
        assert metrics_string(metrics) == "LUFS: N/A | Peak: -inf dBFS | RMS: -inf dBFS"

    def test_tiny_room_smallest_geometry(self, rng):
        rate = 44100
        x = (0.3 * rng.standard_normal(8000)).astype(np.float32)
        p = RenderParams(hall_type="Plate", room_size=10.0, diffusion=0.0,
                         air_absorption=0.0, target_layout="Stereo")
        assert_parity(p, (x, rate))


class TestDynamicEQOracleParity:
    """The length-DYNAMIC exact EQ (padded batches, traced-n0 chirps —
    ops.filters.apply_shelf_eq_dynamic) vs the float64 ORACLE at the clip's
    true length.  CLAUDE.md parity discipline: a new fast path tests
    against the oracle, not just the exact mode — a drift between the
    device band edges/chirps and the oracle's rfftfreq masks at a length
    only the dynamic path reaches must fail HERE."""

    @pytest.mark.parametrize("n0", [5123, 7777, 8000])
    def test_padded_batch_eq_matches_oracle(self, rng, n0):
        from audio_raytracing_studio_tpu.ops import ir_synth
        from audio_raytracing_studio_tpu.parallel import sharding

        rate = 8000
        n_bucket = 8000
        t = np.arange(n0) / rate
        x = (
            0.4 * np.sin(2 * np.pi * 330.0 * t)
            + 0.05 * rng.standard_normal(n0)
        ).astype(np.float32)
        p = RenderParams(
            target_layout="Stereo", room_size=60.0,
            bass_gain=1.7, treble_gain=0.5,
        )
        padded = np.zeros((1, n_bucket), np.float32)
        padded[0, :n0] = x
        seed = 11
        out = sharding.render_batch(
            padded, rate, [p], seeds=[seed], clip_lengths=[n0]
        )[0]
        # the oracle consumes the SAME counter-stream draws the batch used
        g = geometry_for(p, rate)
        shape = ir_synth.IRShape.from_geometry(g)
        d, st, nz = map(np.asarray, ir_synth.hash_draws(seed, shape))
        draws = IRDraws(
            delays=d[: g.reflection_count],
            strengths=st[: g.reflection_count],
            noise=nz[: g.late_length],
        )
        ref = dsp.render(x, rate, p, draws=draws)
        err = float(np.max(np.abs(out[: ref.shape[0]] - ref)))
        assert err <= TOL, f"n0={n0}: dynamic-EQ batch vs oracle {err:.2e}"
        assert np.all(out[ref.shape[0]:] == 0.0)
        # PCM16 quantization contract holds through the dynamic path too
        lsb = int(np.max(np.abs(
            dsp.quantize_pcm16(out[: ref.shape[0]]).astype(np.int32)
            - dsp.quantize_pcm16(ref).astype(np.int32)
        )))
        assert lsb <= max(1, int(np.ceil(TOL * 32768)))


class TestFuzzParity:
    """Randomized parameter combinations vs the oracle (fixed seeds)."""

    @pytest.mark.parametrize("case_seed", [11, 22, 33, 44, 55])
    def test_random_config(self, case_seed):
        rng = np.random.default_rng(case_seed)
        rate = int(rng.choice([16000, 44100, 48000]))
        n = int(rng.integers(rate // 4, rate))
        t = np.arange(n) / rate
        x = (
            0.4 * np.sin(2 * np.pi * rng.uniform(100, 2000) * t)
            + 0.05 * rng.standard_normal(n)
        ).astype(np.float32)
        p = RenderParams(
            hall_type=str(rng.choice(["Plate", "Room", "Cathedral"])),
            material=str(rng.choice(list(config.MATERIAL_ABSORPTION))),
            room_size=float(rng.choice([10, 60, 100, 200])),
            diffusion=float(rng.uniform(0, 1)),
            air_absorption=float(rng.uniform(0, 1)),
            early_level=float(rng.uniform(0, 2)),
            late_level=float(rng.uniform(0, 2)),
            dry_wet=float(rng.uniform(0, 1)),
            dry_wet_kill_start=float(rng.uniform(0, 1)),
            bass_gain=float(rng.uniform(0.1, 5)),
            treble_gain=float(rng.uniform(0.1, 5)),
            x_pos=float(rng.uniform(0, 1)),
            y_pos=float(rng.uniform(0, 1)),
            z_pos=float(rng.uniform(0, 1)),
            target_layout=str(rng.choice(list(config.CHANNEL_LAYOUTS))),
        )
        assert_parity(p, (x, rate), seed=case_seed)
