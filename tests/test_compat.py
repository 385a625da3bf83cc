"""Reference-API façade tests (compat.py).

The BASELINE.json north star requires "the public functions and Gradio entry
points of raytracer_studio.py are preserved".  These tests pin that surface:
every reference public name exists under its exact name/signature, the DSP
functions match the float64 oracle within the parity contract, the guards
replicate the reference's host-visible skips, and the preset/UI handlers
behave like the studio's own event graph.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_raytracing_studio_tpu import compat as rs
from audio_raytracing_studio_tpu import config
from audio_raytracing_studio_tpu.app import _gradio_headless as hgr
from audio_raytracing_studio_tpu.app import api as app_api

TOL = 1e-3  # the project parity contract (PARITY.md); measured ~3e-7 here

# every public function of /root/reference/raytracer_studio.py, by name
REFERENCE_PUBLIC_FUNCTIONS = [
    "ensure_preset_dir", "save_last_preset", "load_last_preset",
    "dynamic_dry_wet_mix", "update_hall_info", "adjust_reverb_parameters_by_hall",
    "adapt_early_late_levels", "compute_final_directionality_3d",
    "adjust_parameters_for_3d", "generate_impulse_response_split_3d",
    "apply_simple_lp_filter", "convolve_audio_split_3d",
    "convolve_audio_external_ir", "apply_surround_panning_3d", "apply_delay",
    "map_channels", "plot_waveform_and_spectrogram_v4", "calculate_audio_metrics",
    "run_audio_profiler_v4", "update_marker_image", "update_controls_from_click",
    "handle_slider_change", "list_presets_for_dropdown_v4",
    "save_current_preset_v4", "load_selected_preset_v4",
    "delete_selected_preset_v4", "export_presets_as_zip_v4",
    "apply_raytrace_convolution_3d", "process_audio_main_v41",
    "toggle_ir_controls_v4", "on_start_v41",
]

REFERENCE_CONSTANTS = [
    "APP_VERSION", "PRESET_DIR", "LAST_PRESET_FILE", "BASE_SURROUND_MAP_PATH",
    "material_absorption", "DEFAULT_MATERIAL", "DEFAULT_HALL_TYPE",
    "CHANNEL_LAYOUTS", "DEFAULT_CHANNEL_LAYOUT",
]


class TestSurface:
    def test_every_reference_function_exists(self):
        for name in REFERENCE_PUBLIC_FUNCTIONS:
            assert callable(getattr(rs, name)), name

    def test_every_reference_constant_exists(self):
        for name in REFERENCE_CONSTANTS:
            assert hasattr(rs, name), name
        assert rs.PRESET_DIR == "presets_v4"
        assert rs.LAST_PRESET_FILE.endswith("last_preset_v4.txt")
        assert rs.material_absorption["Holz"] == 0.35
        assert rs.CHANNEL_LAYOUTS["5.1 (Standard)"]["channels"] == 6

    def test_orchestrator_reexports_are_the_product_entry_points(self):
        assert rs.apply_raytrace_convolution_3d is app_api.apply_raytrace_convolution_3d
        assert rs.process_audio_main_v41 is app_api.process_audio_main_v41


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(7)
    return rng.normal(0.0, 0.2, (4000, 2)).astype(np.float32)


@pytest.fixture(scope="module")
def irs():
    return rs.generate_impulse_response_split_3d(
        8000, 0.3, 12, 0.02, "Holz", 0.6, 0.03, 0.5, seed=3
    )


class TestDSPParity:
    """jax backend vs the float64 oracle backend on the same inputs."""

    def test_hall_params(self):
        assert rs.adjust_reverb_parameters_by_hall("Plate") == (0.8, 25, 0.025, 0.03)
        assert rs.adjust_reverb_parameters_by_hall("???") == (1.5, 35, 0.06, 0.08)

    def test_ir_synth_backends_agree_and_are_seeded(self, irs):
        e1, l1 = irs
        e2, l2 = rs.generate_impulse_response_split_3d(
            8000, 0.3, 12, 0.02, "Holz", 0.6, 0.03, 0.5, seed=3, backend="oracle"
        )
        assert e1.shape == e2.shape and l1.shape == l2.shape
        assert np.max(np.abs(e1 - e2)) < TOL
        assert np.max(np.abs(l1 - l2)) < TOL
        e3, _ = rs.generate_impulse_response_split_3d(
            8000, 0.3, 12, 0.02, "Holz", 0.6, 0.03, 0.5, seed=4
        )
        assert not np.array_equal(e1, e3)  # seed changes the draws
        # reference normalization: early peak 0.9 (sample 0 excluded), late 0.7
        assert np.isclose(np.max(np.abs(e1[1:])), 0.9, atol=1e-4)
        assert np.isclose(np.max(np.abs(l1)), 0.7, atol=1e-4)

    def test_degenerate_ir_falls_back_to_unit_impulse(self):
        e, l = rs.generate_impulse_response_split_3d(
            8000, 0.0, 12, 0.02, "Holz", 0.6, 0.03, 0.5
        )
        assert np.array_equal(e, np.array([1.0], dtype=np.float32))
        assert np.array_equal(l, np.zeros(1, dtype=np.float32))

    def test_convolve_split(self, clip, irs):
        e, l = irs
        args = (clip, e, l, 0.8, 0.6, 0.5, 1.6, 0.7, 8000, 0.5, 0.3)
        a = rs.convolve_audio_split_3d(*args)
        b = rs.convolve_audio_split_3d(*args, backend="oracle")
        assert a.shape == (clip.shape[0] + e.shape[0] - 1, 2)
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < TOL

    def test_convolve_split_unequal_ir_lengths(self, clip, irs):
        """IRs of different lengths (possible through the public surface;
        the reference always generates equal-length pairs) must render on
        BOTH backends — the oracle used to crash on the level-combine
        broadcast while jax returned audio."""
        e, l = irs
        args = (clip, e[:50], l, 0.8, 0.6, 0.5)
        a = rs.convolve_audio_split_3d(*args, rate=8000)
        b = rs.convolve_audio_split_3d(*args, rate=8000, backend="oracle")
        assert a.shape == b.shape == (clip.shape[0] + l.shape[0] - 1, 2)
        assert np.max(np.abs(a - b)) < TOL

    def test_convolve_split_empty_input(self):
        out = rs.convolve_audio_split_3d(
            np.zeros((0, 2), np.float32), np.ones(4), np.ones(4), 1, 1, 0.5
        )
        assert out.shape == (0, 2)

    def test_convolve_external(self, clip):
        rng = np.random.default_rng(1)
        ir = rng.normal(0.0, 0.1, (800, 2)).astype(np.float32)
        args = (clip, ir, 0.6, 1.2, 0.9, 8000, 0.4)
        a = rs.convolve_audio_external_ir(*args)
        b = rs.convolve_audio_external_ir(*args, backend="oracle")
        assert a.shape == (clip.shape[0] + 799, 2)
        assert np.max(np.abs(a - b)) < TOL

    def test_convolve_external_rejects_non_stereo_ir(self, clip):
        mono_ir = np.ones((16, 1), dtype=np.float32)
        out = rs.convolve_audio_external_ir(clip, mono_ir, 0.6)
        assert np.array_equal(out, clip.astype(np.float32))

    def test_pan_and_map(self, clip):
        a = rs.apply_surround_panning_3d(clip, 0.3, 0.7, 0.2)
        b = rs.apply_surround_panning_3d(clip, 0.3, 0.7, 0.2, backend="oracle")
        assert a.shape == (clip.shape[0], 6)
        assert np.max(np.abs(a - b)) < TOL
        for layout, ch in [
            ("Stereo", 2), ("5.1 (Standard)", 6),
            ("7.1 (Surround)", 8), ("5.1.2 (Atmos Light)", 8),
        ]:
            ja, jn = rs.map_channels(a, layout, 8000, 0.4)
            oa, on = rs.map_channels(b, layout, 8000, 0.4, backend="oracle")
            assert ja.shape == (clip.shape[0], ch)
            assert jn == on == config.CHANNEL_LAYOUTS[layout]["names"]
            assert np.max(np.abs(ja - oa)) < TOL

    def test_map_unknown_layout_falls_back_to_default(self, clip):
        six = rs.apply_surround_panning_3d(clip, 0.5, 0.5, 0.5)
        out, names = rs.map_channels(six, "Quadro", 8000)
        ref, ref_names = rs.map_channels(six, config.DEFAULT_CHANNEL_LAYOUT, 8000)
        assert names == ref_names
        assert np.max(np.abs(out - ref)) < TOL

    def test_map_wrong_shape_returns_empty(self):
        out, names = rs.map_channels(np.zeros((10, 4), np.float32), "Stereo", 8000)
        assert out.shape == (0, 2) and names == ["FL", "FR"]

    def test_lp_filter(self, clip):
        a = rs.apply_simple_lp_filter(clip, 8000, 0.5)
        b = rs.apply_simple_lp_filter(clip, 8000, 0.5, backend="oracle")
        assert np.max(np.abs(a - b)) < TOL
        # the reference's guards: skip threshold and bad-shape passthrough
        assert rs.apply_simple_lp_filter(clip, 8000, 0.005) is clip
        assert rs.apply_simple_lp_filter("nope", 8000, 0.5) == "nope"
        one = np.zeros((1, 2), np.float32)
        assert rs.apply_simple_lp_filter(one, 8000, 0.5) is one

    def test_dry_wet_mix_tail_semantics(self, clip):
        longer_wet = np.pad(clip, ((0, 100), (0, 0)))
        m = rs.dynamic_dry_wet_mix(clip, longer_wet, 0.7, 0.4)
        assert m.shape == longer_wet.shape
        # past the dry end only dw·wet remains
        assert np.allclose(m[-100:], 0.7 * longer_wet[-100:], atol=1e-6)
        # dry fully killed at dw=1.0
        assert np.allclose(
            rs.dynamic_dry_wet_mix(clip, clip * 0.0, 1.0, 0.5), 0.0
        )

    def test_apply_delay(self, clip):
        d = rs.apply_delay(clip, 10)
        assert d.shape == clip.shape
        assert np.array_equal(d[:10], np.zeros((10, 2), np.float32))
        assert np.array_equal(d[10:], clip[:-10])
        assert rs.apply_delay(clip, 0) is clip
        assert rs.apply_delay("nope", 5) == "nope"

    def test_metrics_contract(self, clip):
        m = rs.calculate_audio_metrics(clip, 8000)
        assert set(m) == {"lufs", "true_peak_dbfs", "rms_dbfs"}
        assert all(v is not None for v in m.values())
        none = {"lufs": None, "true_peak_dbfs": None, "rms_dbfs": None}
        assert rs.calculate_audio_metrics(None, 8000) == none
        assert rs.calculate_audio_metrics(clip, 0) == none
        assert rs.calculate_audio_metrics([1, 2, 3], 8000) == none
        assert rs.calculate_audio_metrics(np.zeros((2, 2, 2)), 8000) == none


class TestPresetsAndHandlers:
    def test_preset_cycle_through_reference_names(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        rs.ensure_preset_dir()
        assert (tmp_path / rs.PRESET_DIR).is_dir()
        assert rs.list_presets_for_dropdown_v4() == []

        values = [getattr(__import__(
            "audio_raytracing_studio_tpu.params", fromlist=["RenderParams"]
        ).RenderParams(), k) for k in config.PRESET_KEYS]
        msg, update = rs.save_current_preset_v4("My Hall", *values)
        assert msg.startswith("✅")
        files = rs.list_presets_for_dropdown_v4()
        assert files == ["My_Hall_v4.json"]

        updates = rs.load_selected_preset_v4(files[0])
        assert len(updates) == len(config.PRESET_KEYS)

        rs.save_last_preset(files[0])
        assert rs.load_last_preset() == files[0]

        zip_path = rs.export_presets_as_zip_v4()
        assert zip_path and zip_path.endswith(".zip")

        msg, update = rs.delete_selected_preset_v4(files[0])
        assert "gelöscht" in msg
        assert rs.list_presets_for_dropdown_v4() == []

    def test_toggle_ir_controls_v4(self):
        ups = rs.toggle_ir_controls_v4(True)
        assert len(ups) == 8
        assert ups[0]["interactive"] is True  # external IR input enabled
        assert all(u["interactive"] is False for u in ups[1:])
        ups = rs.toggle_ir_controls_v4(False)
        assert ups[0]["interactive"] is False
        assert all(u["interactive"] is True for u in ups[1:])

    def test_marker_handlers(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from audio_raytracing_studio_tpu.app import marker

        marker.ensure_map_asset()
        path = rs.update_marker_image(0.25, 0.75)
        assert path and path.endswith(".png")

        from PIL import Image

        with Image.open(config.BASE_SURROUND_MAP_PATH) as im:
            w, h = im.size
        x_up, y_up, img_up = rs.update_controls_from_click(
            hgr.SelectData(index=(int(0.75 * w), int(0.25 * h)))
        )
        assert abs(x_up["value"] - 0.75) < 0.01
        assert abs(y_up["value"] - 0.25) < 0.01
        assert img_up["value"].endswith(".png")
        # malformed events → no-op updates (index=None is what the HTTP
        # server constructs for a select payload without coordinates)
        res = rs.update_controls_from_click(None)
        assert all("value" not in u for u in res)
        res = rs.update_controls_from_click(hgr.SelectData(index=None))
        assert all("value" not in u for u in res)
        res = rs.update_controls_from_click(hgr.SelectData(index=(120,)))
        assert all("value" not in u for u in res)

        slider_up = rs.handle_slider_change(0.5, 0.5)
        assert slider_up["value"].endswith(".png")

    def test_on_start_v41_update_vector(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        updates = rs.on_start_v41()
        # the studio's on_start_outputs wiring: preset list + 16 controls +
        # map/marker/hall-info + 8 interactivity updates + status line
        assert len(updates) == 1 + len(config.PRESET_KEYS) + 3 + 8 + 1
        assert updates[-1]["value"] == "Bereit. Bitte Audio laden."

    def test_update_hall_info(self):
        for hall in config.HALL_PRESETS:
            assert config.HALL_INFO_TEXTS[hall] in rs.update_hall_info(hall)
        assert (
            config.HALL_INFO_TEXTS[config.DEFAULT_HALL_TYPE]
            in rs.update_hall_info("unknown")
        )


class TestComposition:
    def test_facade_composes_to_the_product_render(self):
        """The reference orchestrator's call order, executed through the
        façade piece by piece, reproduces models.pipeline.render exactly
        (same seed → same hash-draw stream → same jitted stages)."""
        import audio_raytracing_studio_tpu.params as P
        from audio_raytracing_studio_tpu.models import pipeline

        rng = np.random.default_rng(5)
        audio = rng.normal(0, 0.15, (6000, 2)).astype(np.float32)
        rate = 8000
        p = P.RenderParams(
            hall_type="Plate", room_size=220.0, diffusion=0.4,
            air_absorption=0.3, early_level=0.9, late_level=0.7,
            dry_wet=0.55, dry_wet_kill_start=0.4, bass_gain=1.3,
            treble_gain=0.8, x_pos=0.3, y_pos=0.65, z_pos=0.45,
            target_layout="5.1.2 (Atmos Light)",
        )
        dur, refs, maxd, split = rs.adjust_parameters_for_3d(
            p.hall_type, p.room_size, p.z_pos
        )
        direc = rs.compute_final_directionality_3d(
            p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
        )
        e, l = rs.generate_impulse_response_split_3d(
            rate, dur, refs, maxd, p.material, direc, split, p.diffusion, seed=11
        )
        el, ll = rs.adapt_early_late_levels(p.dry_wet, p.early_level, p.late_level)
        mixed = rs.convolve_audio_split_3d(
            audio, e, l, el, ll, p.dry_wet, p.bass_gain, p.treble_gain,
            rate, p.dry_wet_kill_start, p.air_absorption,
        )
        six = rs.apply_surround_panning_3d(mixed, p.x_pos, p.y_pos, p.z_pos)
        mapped, _ = rs.map_channels(six, p.target_layout, rate, p.z_pos)

        out = pipeline.render(audio, rate, p, seed=11)
        assert mapped.shape == out.shape
        assert np.array_equal(mapped, out)  # bit-identical, measured 0.0
