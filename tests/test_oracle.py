"""Oracle self-consistency and property tests (pure NumPy, no JAX)."""

import numpy as np
import pytest

from audio_raytracing_studio_tpu import config
from audio_raytracing_studio_tpu.params import (
    IRDraws,
    RenderParams,
    adapt_early_late_levels,
    adjust_parameters_for_3d,
    compute_final_directionality_3d,
    derive_ir_geometry,
    dry_kill_factor,
)
from audio_raytracing_studio_tpu.oracle import dsp


def make_geometry(rate=48000, hall="Room", room_size=100.0, z=0.5, material="Holz",
                  diffusion=0.5, x=0.5, y=0.5, dw=0.5):
    dur, refs, max_delay, split = adjust_parameters_for_3d(hall, room_size, z)
    directionality = compute_final_directionality_3d(x, y, z, hall, diffusion, dw)
    return derive_ir_geometry(rate, dur, refs, max_delay, material, directionality,
                              split, diffusion)


class TestParamMath:
    def test_hall_presets_room_default_values(self):
        # Room base: (1.5, 35, 0.06, 0.08) at size 100 → size factors all 1.
        dur, refs, max_delay, split = adjust_parameters_for_3d("Room", 100.0, 0.5)
        assert dur == pytest.approx(1.5)
        assert refs == 35
        assert max_delay == pytest.approx(0.06)
        assert split == pytest.approx(0.08)

    def test_unknown_hall_falls_back_to_room(self):
        assert adjust_parameters_for_3d("Nope", 100.0, 0.5) == adjust_parameters_for_3d(
            "Room", 100.0, 0.5
        )

    def test_duration_scaling_and_cap(self):
        dur, _, _, _ = adjust_parameters_for_3d("Cathedral", 1000.0, 0.5)
        # Cathedral 4.0 * 10^0.33 ≈ 8.55 s, under the 10 s cap
        assert dur == pytest.approx(4.0 * 10**0.33)
        assert dur <= 10.0
        # the duration clip itself caps at 10 s (raytracer_studio.py:223)
        import audio_raytracing_studio_tpu.config as cfg
        assert cfg.DURATION_CLIP[1] == 10.0

    def test_reflection_count_clip(self):
        _, refs_small, _, _ = adjust_parameters_for_3d("Cathedral", 10.0, 0.5)
        _, refs_big, _, _ = adjust_parameters_for_3d("Room", 1000.0, 0.5)
        assert 5 <= refs_small <= 80 and 5 <= refs_big <= 80

    def test_directionality_center_defaults(self):
        d = compute_final_directionality_3d(0.5, 0.5, 0.5, "Room", 0.5, 0.5)
        # position_factor=1, base=0.65, diffusion factor=0.6, boost=0
        assert d == pytest.approx(0.65 * 0.6)

    def test_directionality_clip_range(self):
        for hall in ("Plate", "Room", "Cathedral"):
            for x in (0.0, 1.0):
                d = compute_final_directionality_3d(x, 1.0, 0.0, hall, 1.0, 1.0)
                assert 0.05 <= d <= 0.95

    def test_adapt_levels(self):
        e, l = adapt_early_late_levels(0.0, 0.8, 0.6)
        assert (e, l) == (pytest.approx(0.8), pytest.approx(0.6))
        e, l = adapt_early_late_levels(1.0, 0.8, 0.6)
        assert e == pytest.approx(0.8 * 0.3)
        assert l == pytest.approx(0.6 * 1.6)

    def test_invalid_room_size_mirrors_reference(self):
        """Degenerate room_size follows the reference's actual math:
        NaN raises inside its try and falls back to the DEFAULT hall's base
        params (NOT the requested hall's); negative sizes resolve to the
        LOW-clip scale factors (the complex powers clip to the low bound);
        +inf rides the formula into the HIGH clips without raising."""
        import numpy as np

        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.params import (
            adjust_parameters_for_3d,
            hall_base_parameters,
        )

        room = hall_base_parameters(config.DEFAULT_HALL_TYPE)
        cath = hall_base_parameters("Cathedral")

        # NaN → DEFAULT hall base, even when Cathedral was requested
        dur, cnt, dly, split = adjust_parameters_for_3d("Cathedral", float("nan"), 0.5)
        assert (dur, cnt, dly, split) == (
            room.ir_duration_s, room.reflection_count,
            room.max_early_delay_s, room.early_late_split_s,
        )

        # negative / zero → low-clip factors applied to the REQUESTED hall
        for bad in (-5.0, 0.0, float("-inf")):
            dur, cnt, dly, split = adjust_parameters_for_3d("Cathedral", bad, 0.5)
            assert dur == pytest.approx(
                np.clip(cath.ir_duration_s * config.SIZE_DUR_CLIP[0], *config.DURATION_CLIP)
            )
            assert dly == pytest.approx(
                np.clip(cath.max_early_delay_s * config.SIZE_DELAY_CLIP[0], *config.MAX_DELAY_CLIP)
            )

        # +inf → high-clip factors, no exception
        dur, cnt, dly, split = adjust_parameters_for_3d("Room", float("inf"), 0.5)
        assert dur == pytest.approx(
            np.clip(room.ir_duration_s * config.SIZE_DUR_CLIP[1], *config.DURATION_CLIP)
        )

        # NaN z_pos must not crash the geometry derivation downstream
        dur, cnt, dly, split = adjust_parameters_for_3d("Room", 100.0, float("nan"))
        assert np.isfinite(dly) and dly > 0

    def test_channel_weights_exclude_lfe(self):
        from audio_raytracing_studio_tpu.metering import kweighting as kw

        w6 = kw.channel_weights(6)  # FL FR C LFE RL RR
        assert list(w6) == [1.0, 1.0, 1.0, 0.0, 1.41, 1.41]
        assert list(kw.channel_weights(2)) == [1.0, 1.0]
        assert kw.channel_weights(8)[3] == 0.0 and kw.channel_weights(8)[6] == 1.41

    def test_dry_kill_factor(self):
        assert dry_kill_factor(0.4, 0.5) == 1.0
        assert dry_kill_factor(0.75, 0.5) == pytest.approx(0.5)
        assert dry_kill_factor(1.0, 0.5) == 0.0
        assert dry_kill_factor(0.5, 1.0) == 1.0  # kill disabled at ks=1


class TestIRSynthesis:
    def test_shapes_and_norms(self, rng):
        g = make_geometry()
        draws = IRDraws.sample(rng, g)
        early, late = dsp.generate_impulse_response_split(g, draws)
        assert early.shape == (g.length,) and late.shape == (g.length,)
        assert early.dtype == np.float32 and late.dtype == np.float32
        assert np.max(np.abs(early[1:])) == pytest.approx(0.9, abs=1e-5)
        assert np.max(np.abs(late)) == pytest.approx(0.7, abs=1e-5)
        assert early[0] == 0.0
        # early taps live strictly before the split point
        assert not np.any(early[g.split_point:])
        # late tail strictly after
        assert not np.any(late[: g.split_point])

    def test_decay_envelope_reaches_minus_50db(self, rng):
        g = make_geometry(hall="Cathedral", room_size=400.0)
        draws = IRDraws.sample(rng, g)
        _, late = dsp.generate_impulse_response_split(g, draws)
        # decay should reduce late-tail magnitude by orders of magnitude
        head = np.max(np.abs(late[g.split_point : g.split_point + 4800]))
        tail = np.max(np.abs(late[-4800:]))
        assert tail < head * 0.05

    def test_deterministic_given_draws(self, rng):
        g = make_geometry()
        draws = IRDraws.sample(rng, g)
        a = dsp.generate_impulse_response_split(g, draws)
        b = dsp.generate_impulse_response_split(g, draws)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


class TestConvolutionEngine:
    def test_output_length_law(self, rng, tone48k):
        x, rate = tone48k
        g = make_geometry(rate=rate)
        draws = IRDraws.sample(rng, g)
        early, late = dsp.generate_impulse_response_split(g, draws)
        out = dsp.convolve_audio_split(x, early, late, 0.8, 0.6, 0.5, rate=rate)
        assert out.shape == (x.shape[0] + g.length - 1, 2)

    def test_peak_never_exceeds_one(self, rng, tone48k):
        x, rate = tone48k
        g = make_geometry(rate=rate)
        draws = IRDraws.sample(rng, g)
        early, late = dsp.generate_impulse_response_split(g, draws)
        out = dsp.convolve_audio_split(
            x * 2.0, early, late, 2.0, 2.0, 0.9, bass_gain=5.0, rate=rate
        )
        assert np.max(np.abs(out)) <= 1.0 + 1e-6

    def test_dry_only_passthrough(self, tone48k):
        x, rate = tone48k
        ir = np.zeros(1000, dtype=np.float32)
        ir[0] = 1.0
        out = dsp.convolve_audio_split(x, ir, np.zeros(1000, np.float32), 1.0, 1.0,
                                       0.0, rate=rate)
        # dry_wet=0 → pure dry signal (padded)
        assert np.allclose(out[: x.shape[0], 0], x, atol=1e-6)

    def test_external_ir_identity_impulse(self, tone48k):
        x, rate = tone48k
        ir = np.zeros((8, 2), dtype=np.float32)
        ir[0, :] = 1.0
        out = dsp.convolve_audio_external_ir(x, ir, 1.0, rate=rate, kill_start_dw=1.0)
        # dw=1 → pure wet; identity IR → input back (within fft tolerance)
        assert np.max(np.abs(out[: x.shape[0], 0] - x)) < 1e-5

    def test_external_ir_rejects_mono(self, tone48k):
        x, rate = tone48k
        bad_ir = np.zeros((8, 1), dtype=np.float32)
        out = dsp.convolve_audio_external_ir(x, bad_ir, 0.5, rate=rate)
        assert out.shape[0] == x.shape[0]  # input returned unchanged

    def test_air_absorption_damps_treble(self, rng):
        rate = 48000
        t = np.arange(rate) / rate
        hi = np.sin(2 * np.pi * 10000 * t).astype(np.float32)[:, None]
        lo = np.sin(2 * np.pi * 500 * t).astype(np.float32)[:, None]
        hi_f = dsp.apply_air_absorption(np.repeat(hi, 2, 1), rate, 1.0)
        lo_f = dsp.apply_air_absorption(np.repeat(lo, 2, 1), rate, 1.0)
        assert np.max(np.abs(hi_f)) < 0.75  # ~10k damped
        assert np.max(np.abs(lo_f)) > 0.95  # 500 Hz untouched

    def test_shelf_eq_boosts_bass(self):
        rate = 48000
        t = np.arange(rate) / rate
        bass = np.sin(2 * np.pi * 100 * t).astype(np.float32)[:, None]
        out = dsp.apply_shelf_eq(np.repeat(bass, 2, 1), rate, 2.0, 1.0)
        assert np.max(np.abs(out)) == pytest.approx(2.0, rel=0.01)

    def test_shelf_eq_skipped_at_unity(self, tone48k):
        x, rate = tone48k
        x2 = np.stack([x, x], 1)
        out = dsp.apply_shelf_eq(x2, rate, 1.0, 1.0)
        assert out is x2


class TestSpatial:
    def test_pan_center_gains(self):
        g = dsp.surround_panning_gains(0.5, 0.5, 0.5)
        s = np.sqrt(0.5)
        assert g["fl"] == pytest.approx(s * s)
        assert g["fr"] == pytest.approx(s * s)
        assert g["center"] == pytest.approx(1.0 * s)
        assert g["lfe"] == 0.15

    def test_pan_hard_left_front(self, tone48k):
        x, rate = tone48k
        stereo = np.stack([x, x], 1)
        out = dsp.apply_surround_panning(stereo, 0.0, 0.0, 0.5)
        assert out.shape == (x.shape[0], 6)
        assert np.max(np.abs(out[:, 1])) < 1e-7  # FR silent
        assert np.max(np.abs(out[:, 4])) < 1e-7  # RL silent (front)
        assert np.max(np.abs(out[:, 0])) > 0.1  # FL active

    def test_map_channels_shapes(self, tone48k):
        x, rate = tone48k
        six = dsp.apply_surround_panning(np.stack([x, x], 1), 0.5, 0.5, 0.5)
        for name, info in config.CHANNEL_LAYOUTS.items():
            out, names = dsp.map_channels(six, name, rate, 0.5)
            assert out.shape == (six.shape[0], info["channels"])
            assert names == info["names"]

    def test_map_71_side_delay(self, tone48k):
        x, rate = tone48k
        six = np.zeros((x.shape[0], 6), dtype=np.float32)
        six[:, 4] = x  # RL only
        out, _ = dsp.map_channels(six, "7.1 (Surround)", rate, 0.5)
        delay = int(rate * 12 / 1000)
        assert np.allclose(out[delay:, 6], x[:-delay] * 0.7, atol=1e-6)
        assert not np.any(out[:delay, 6])

    def test_map_512_height_z_gain(self, tone48k):
        x, rate = tone48k
        six = np.zeros((x.shape[0], 6), dtype=np.float32)
        six[:, 4] = x
        out_z0, _ = dsp.map_channels(six, "5.1.2 (Atmos Light)", rate, 0.0)
        out_z1, _ = dsp.map_channels(six, "5.1.2 (Atmos Light)", rate, 1.0)
        assert not np.any(out_z0[:, 6])  # z=0 → silent heights
        assert np.max(np.abs(out_z1[:, 6])) > 0.0

    def test_stereo_downmix_formula(self):
        six = np.zeros((4, 6), dtype=np.float32)
        six[0] = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
        out, _ = dsp.map_channels(six, "Stereo", 48000, 0.5)
        assert out[0, 0] == pytest.approx(0.1 + 0.3 * 0.707 + 0.5 * 0.5)
        assert out[0, 1] == pytest.approx(0.2 + 0.3 * 0.707 + 0.6 * 0.5)


class TestFullRender:
    def test_render_internal_all_layouts(self, rng, tone48k):
        x, rate = tone48k
        for layout in config.CHANNEL_LAYOUTS:
            p = RenderParams(target_layout=layout)
            out = dsp.render(x, rate, p, rng=np.random.default_rng(1))
            assert out.shape[1] == config.CHANNEL_LAYOUTS[layout]["channels"]
            assert np.max(np.abs(out)) <= 1.0 + 1e-6

    def test_render_external(self, rng, tone48k):
        x, rate = tone48k
        ir = (rng.standard_normal((4800, 2)) * np.exp(-np.arange(4800) / 400)[:, None])
        p = RenderParams(use_external_ir=True, target_layout="Stereo")
        out = dsp.render(x, rate, p, external_ir=ir.astype(np.float32))
        assert out.shape == (x.shape[0] + 4800 - 1, 2)

    def test_quantize_pcm16_contract(self):
        x = np.array([0.0, 0.5, -0.5, 2.0, -2.0, np.nan, np.inf], dtype=np.float32)
        q = dsp.quantize_pcm16(x)
        assert q.dtype == np.int16
        assert q[0] == 0
        assert q[1] == 16384
        assert q[2] == -16384
        assert q[3] == np.rint(0.9999 * 32768)  # clipped
        assert q[5] == 0 and q[6] == np.rint(0.9999 * 32768)

    def test_preset_roundtrip_identity(self):
        p = RenderParams(hall_type="Cathedral", room_size=420.0, x_pos=0.25)
        assert RenderParams.from_preset_dict(p.to_preset_dict()) == p


class TestTopLevelAPI:
    def test_render_facade(self, rng, tone48k):
        import audio_raytracing_studio_tpu as ars

        x, rate = tone48k
        out = ars.render(x[: rate // 4], rate, ars.RenderParams(target_layout="Stereo"), seed=1)
        assert out.shape[1] == 2

    def test_profiling_harness(self):
        import jax.numpy as jnp

        from audio_raytracing_studio_tpu.utils.profiling import time_jitted

        r = time_jitted(lambda x: jnp.sum(x * 2), jnp.ones(1000), name="t", iterations=3)
        assert r.seconds_per_call > 0
        assert "t:" in str(r)
