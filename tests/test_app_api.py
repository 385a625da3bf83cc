"""Public API contract tests: apply_raytrace_convolution_3d /
process_audio_main_v41 signatures, error strings, WAV output; visualizer,
profiler, marker, CLI."""

import json
import os

import numpy as np
import pytest

from audio_raytracing_studio_tpu import config
from audio_raytracing_studio_tpu.app import api, marker
from audio_raytracing_studio_tpu.analysis.metrics import metrics_string
from audio_raytracing_studio_tpu.analysis.profiler import run_audio_profiler
from audio_raytracing_studio_tpu.analysis.visualize import plot_waveform_and_spectrogram
from audio_raytracing_studio_tpu.utils import wavio


@pytest.fixture
def wav_file(tmp_path, tone48k):
    x, rate = tone48k
    path = tmp_path / "in.wav"
    wavio.write(path, x, rate)
    return str(path)


DEFAULT_ARGS = dict(
    external_ir_path=None,
    use_external_ir_cb=False,
    hall_type_val="Room",
    room_size_val=100.0,
    diffusion_val=0.5,
    air_absorption_val=0.1,
    base_early_level=0.8,
    base_late_level=0.6,
    dry_wet=0.5,
    dry_wet_kill_start=0.5,
    bass_gain=1.0,
    treble_gain=1.0,
    x_pos=0.5,
    y_pos=0.5,
    z_pos=0.5,
    material="Holz",
    target_channel_layout="5.1 (Standard)",
)


class TestApplyRaytrace:
    def test_happy_path(self, wav_file):
        player, download, metrics = api.apply_raytrace_convolution_3d(
            wav_file, seed=3, **DEFAULT_ARGS
        )
        assert player == download and os.path.exists(player)
        assert metrics.startswith("LUFS: ") and "| Peak: " in metrics and "dBFS" in metrics
        data, rate = wavio.read(player)
        assert rate == 48000 and data.shape[1] == 6
        os.remove(player)

    def test_missing_file_error_contract(self):
        player, download, msg = api.apply_raytrace_convolution_3d(
            "/nonexistent.wav", **DEFAULT_ARGS
        )
        assert player is None and download is None
        assert "Fehler beim Laden" in msg

    def test_bad_params_error_contract(self, wav_file):
        args = dict(DEFAULT_ARGS, room_size_val="not a number")
        player, _, msg = api.apply_raytrace_convolution_3d(wav_file, **args)
        assert player is None and "Fehlerhafte Eingabeparameter" in msg

    def test_external_ir_missing(self, wav_file):
        args = dict(DEFAULT_ARGS, use_external_ir_cb=True)
        player, _, msg = api.apply_raytrace_convolution_3d(wav_file, **args)
        assert player is None and "keine Datei gefunden" in msg

    def test_external_ir_mono_rejected(self, wav_file, tmp_path):
        ir_path = tmp_path / "mono_ir.wav"
        wavio.write(ir_path, np.zeros(100, np.float32), 48000)
        args = dict(DEFAULT_ARGS, use_external_ir_cb=True, external_ir_path=str(ir_path))
        player, _, msg = api.apply_raytrace_convolution_3d(wav_file, **args)
        assert player is None and "Stereo" in msg

    def test_seeded_determinism(self, wav_file):
        a = api.apply_raytrace_convolution_3d(wav_file, seed=9, **DEFAULT_ARGS)
        b = api.apply_raytrace_convolution_3d(wav_file, seed=9, **DEFAULT_ARGS)
        da, _ = wavio.read(a[0])
        db, _ = wavio.read(b[0])
        assert np.array_equal(da, db)
        os.remove(a[0]); os.remove(b[0])


class TestProcessMain:
    def test_upload_over_mic(self, wav_file):
        args16 = [False, "Room", "Holz", 100.0, 0.5, 0.1, 0.8, 0.6, 0.5, 0.5,
                  1.0, 1.0, 0.5, 0.5, 0.5, "Stereo"]
        player, download, metrics = api.process_audio_main_v41(
            wav_file, None, None, *args16, seed=1
        )
        assert player and os.path.exists(player)
        assert "LUFS" in metrics
        os.remove(player)

    def test_no_source(self):
        args16 = [False, "Room", "Holz", 100.0, 0.5, 0.1, 0.8, 0.6, 0.5, 0.5,
                  1.0, 1.0, 0.5, 0.5, 0.5, "Stereo"]
        player, download, msg = api.process_audio_main_v41(None, None, None, *args16)
        assert player is None and msg == "Keine gültige Quelle"

    def test_wrong_arg_count(self, wav_file):
        player, _, msg = api.process_audio_main_v41(wav_file, None, None, False, "Room")
        assert player is None and "Argumentanzahl" in msg


class TestMetricsString:
    def test_format(self):
        s = metrics_string({"lufs": -23.456, "true_peak_dbfs": -3.21, "rms_dbfs": -20.0})
        assert s == "LUFS: -23.46 | Peak: -3.2 dBFS | RMS: -20.0 dBFS"

    def test_silence(self):
        s = metrics_string({"lufs": float("-inf"), "true_peak_dbfs": float("-inf"),
                            "rms_dbfs": float("-inf")})
        assert s == "LUFS: N/A | Peak: -inf dBFS | RMS: -inf dBFS"


class TestAnalysis:
    def test_visualizer_produces_png(self, wav_file):
        path = plot_waveform_and_spectrogram(wav_file, "Test")
        assert path and path.endswith(".png") and os.path.getsize(path) > 1000
        os.remove(path)

    def test_metrics_3d_input_returns_none_dict(self):
        """The reference API returns the None-metrics dict for malformed
        input (raytracer_studio.py error path), never raises."""
        from audio_raytracing_studio_tpu.analysis.metrics import (
            calculate_audio_metrics,
        )

        m = calculate_audio_metrics(np.zeros((4, 3, 2), np.float32), 48000)
        assert m == {"lufs": None, "true_peak_dbfs": None, "rms_dbfs": None}

    def test_profiler_rate_zero_degrades(self, wav_file, monkeypatch):
        """A WAV declaring sample rate 0 must produce the degraded report
        (duration 0), not ZeroDivisionError (reference's rate>0 guard)."""
        from audio_raytracing_studio_tpu.analysis import profiler

        real_read = profiler.wavio.read
        monkeypatch.setattr(
            profiler.wavio, "read", lambda p: (real_read(p)[0], 0)
        )
        report = profiler.run_audio_profiler(wav_file, wav_file)
        assert "0.00s @ 0 Hz" in report

    def test_visualizer_device_stft(self, wav_file):
        path = plot_waveform_and_spectrogram(wav_file, "Test", use_device_stft=True)
        assert path and os.path.getsize(path) > 1000
        os.remove(path)

    def test_device_stft_matches_scipy(self, rng):
        """Review regression: the device STFT used the symmetric hann and
        skipped scipy's constant detrend — now bin-for-bin comparable."""
        from audio_raytracing_studio_tpu.analysis.visualize import compute_spectrogram

        rate = 8000
        t = np.arange(4 * 1024) / rate
        x = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.1  # DC offset exercises detrend
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        f_s, t_s, sxx_s = compute_spectrogram(x, rate, 1024, use_device=False)
        f_d, t_d, sxx_d = compute_spectrogram(x, rate, 1024, use_device=True)
        assert np.allclose(f_s, f_d) and sxx_s.shape == np.asarray(sxx_d).shape
        np.testing.assert_allclose(np.asarray(sxx_d), sxx_s, rtol=1e-3, atol=1e-9)

    def test_device_stft_odd_nperseg_matches_scipy(self, rng):
        """Odd nfft (a short clip clamps nperseg to the signal length) has no
        pure-Nyquist bin — scipy doubles the last onesided bin there, and the
        device path must too (it used to read 3 dB low)."""
        from audio_raytracing_studio_tpu.analysis.visualize import compute_spectrogram

        rate = 8000
        n = 1023  # odd
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        f_s, _, sxx_s = compute_spectrogram(x, rate, n, use_device=False)
        f_d, _, sxx_d = compute_spectrogram(x, rate, n, use_device=True)
        assert np.allclose(f_s, f_d)
        np.testing.assert_allclose(np.asarray(sxx_d), sxx_s, rtol=1e-3, atol=1e-10)

    def test_visualizer_error_png(self):
        path = plot_waveform_and_spectrogram("/nonexistent.wav", "Test")
        assert path and path.endswith(".png")  # error-PNG fallback
        os.remove(path)

    def test_profiler_report(self, wav_file, tmp_path, tone48k):
        x, rate = tone48k
        proc = tmp_path / "proc.wav"
        wavio.write(proc, np.stack([x * 0.5, x * 0.4], 1), rate)
        report = run_audio_profiler(wav_file, str(proc))
        assert "Audio-Profiler Bericht" in report
        assert "Integrated LUFS" in report
        assert "Stereo-Breite" in report
        assert "Kanalpegel" in report
        assert "Zusammenfassung" in report

    def test_profiler_rate_mismatch(self, wav_file, tmp_path):
        other = tmp_path / "o.wav"
        wavio.write(other, np.zeros(1000, np.float32), 44100)
        report = run_audio_profiler(wav_file, str(other))
        assert "Sample-Raten unterschiedlich" in report

    def test_profiler_missing_file(self, wav_file):
        report = run_audio_profiler(wav_file, "/nonexistent.wav")
        assert "Bearbeitete Datei fehlt" in report


class TestMarker:
    def test_marker_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        base = marker.ensure_map_asset()
        assert os.path.exists(base)
        m = marker.update_marker_image(0.3, 0.7)
        assert m and os.path.exists(m)
        w, h = marker.MAP_SIZE
        norm = marker.click_to_normalized(w // 2, h // 2)
        assert norm == (0.5, 0.5)
        os.remove(m)

    def test_map_asset_is_a_real_layout(self, tmp_path, monkeypatch):
        """Not a placeholder: a full-size rendered speaker map (ref ships a
        94 KB surround_layout_3d.png, raytracer_studio.py:26)."""
        monkeypatch.chdir(tmp_path)
        base = marker.ensure_map_asset()
        from PIL import Image

        with Image.open(base) as img:
            assert img.size == marker.MAP_SIZE
            # enough visual structure to be a map, not a flat fill
            colors = img.convert("RGB").getcolors(maxcolors=100000)
            assert colors and len(colors) > 50
        assert os.path.getsize(base) > 5000

    def test_click_corners_clip(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        marker.ensure_map_asset()
        w, h = marker.MAP_SIZE
        assert marker.click_to_normalized(0, 0) == (0.0, 0.0)
        assert marker.click_to_normalized(10 * w, 10 * h) == (1.0, 1.0)
        assert marker.click_to_normalized(-5, -5) == (0.0, 0.0)


class TestStudioGating:
    def test_headless_fallback(self, tmp_path, monkeypatch):
        """Without gradio, build_demo() runs on the headless runtime and
        studio.main() serves it over the native HTTP server on the
        reference port (see tests/test_http_server.py for the drive)."""
        monkeypatch.chdir(tmp_path)
        from audio_raytracing_studio_tpu.app import studio
        from audio_raytracing_studio_tpu.app import _gradio_headless as hl

        assert studio.GRADIO_AVAILABLE is False
        demo = studio.build_demo()
        assert demo is not None

        served = {}

        def fake_launch(self, server_name="0.0.0.0", server_port=8861, **_):
            served["addr"] = (server_name, server_port)

        monkeypatch.setattr(hl.Blocks, "launch", fake_launch)
        studio.main()
        assert served["addr"] == ("0.0.0.0", 8861)


class TestCLI:
    def test_render_cli(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main

        out = tmp_path / "out.wav"
        rc = main([wav_file, str(out), "--layout", "Stereo", "--seed", "1",
                   "--metrics", "--room-size", "50"])
        assert rc == 0 and out.exists()
        assert "LUFS" in capsys.readouterr().out

    def test_render_cli_sweep(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "s{i}.wav"), "--layout", "Stereo",
                   "--room-size", "50", "--sweep", "diffusion=0.2,0.8", "--json"])
        assert rc == 0
        results = json.loads(capsys.readouterr().out)
        assert len(results) == 2
        assert (tmp_path / "s0.wav").exists() and (tmp_path / "s1.wav").exists()

    def test_analyzer_cli(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.analyzer import main

        rc = main(["analyze", wav_file])
        assert rc == 0
        info = json.loads(capsys.readouterr().out)
        assert info["Abtastrate"] == 48000 and info["Kanäle"] == 1

        out = tmp_path / "norm.wav"
        rc = main(["normalize", wav_file, str(out), "--target", "-20"])
        assert rc == 0
        result = json.loads(capsys.readouterr().out)
        assert abs(result["output_lufs"] + 20.0) < 0.3

    def test_analyzer_true_peak_flag(self, wav_file, capsys):
        """--true-peak surfaces the 4x oversampled inter-sample peak (the
        BS.1770 Annex 2 extension; the reference's 'Peak' is sample peak)."""
        from audio_raytracing_studio_tpu.cli.analyzer import main

        rc = main(["analyze", wav_file, "--true-peak"])
        assert rc == 0
        info = json.loads(capsys.readouterr().out)
        tp = info["True Peak 4x (dBTP)"]
        # inter-sample peak can only be >= the sample peak
        assert float(tp) >= float(info["Peak (dBFS)"]) - 1e-6


class TestCLIPresetFlow:
    def test_save_then_render_via_preset(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main
        from audio_raytracing_studio_tpu.params import RenderParams
        from audio_raytracing_studio_tpu.utils.presets import PresetStore

        store = PresetStore(str(tmp_path))
        store.save("cli flow", RenderParams(hall_type="Plate", room_size=40.0,
                                            target_layout="Stereo"))
        out = tmp_path / "p.wav"
        rc = main([wav_file, str(out), "--preset", "cli_flow_v4.json",
                   "--preset-dir", str(tmp_path), "--seed", "2"])
        assert rc == 0 and out.exists()
        data, rate = wavio.read(out)
        assert data.shape[1] == 2  # preset layout respected

    def test_sweep_with_external_ir(self, wav_file, tmp_path, capsys):
        """Review regression: --sweep + --external-ir must not crash."""
        from audio_raytracing_studio_tpu.cli.render import main

        ir_path = tmp_path / "ir.wav"
        rng = np.random.default_rng(5)
        wavio.write(ir_path, (rng.standard_normal((400, 2)) * 0.2).astype(np.float32), 48000)
        rc = main([wav_file, str(tmp_path / "e{i}.wav"), "--external-ir", str(ir_path),
                   "--sweep", "dry_wet=0.3,0.8", "--json"])
        assert rc == 0
        assert (tmp_path / "e0.wav").exists() and (tmp_path / "e1.wav").exists()

    def test_sweep_z_rejected(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "z{i}.wav"), "--sweep", "z_pos=0.1,0.9"])
        assert rc == 2

    def test_sweep_bad_values_clean_error(self, wav_file, tmp_path, capsys):
        """Malformed or empty sweep value lists must exit 2 with a message,
        not escape as raw tracebacks."""
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "s{i}.wav"),
                   "--sweep", "diffusion=0.1,abc"])
        assert rc == 2
        assert "numbers" in capsys.readouterr().err
        rc = main([wav_file, str(tmp_path / "s{i}.wav"), "--sweep", "diffusion="])
        assert rc == 2
        assert "at least one value" in capsys.readouterr().err

    def test_sweep_flag_flipping_values(self, wav_file, tmp_path, capsys):
        """Sweeps crossing stage on/off thresholds (eq/air/early) batch fine
        (the spec flags widen batch-wide in parallel.sharding)."""
        from audio_raytracing_studio_tpu.cli.render import main

        for sweep in ("bass_gain=1.0,1.5", "air_absorption=0.0,0.5",
                      "early_level=0,0.5"):
            rc = main([wav_file, str(tmp_path / (sweep[:3] + "{i}.wav")),
                       "--sweep", sweep, "--room-size", "50",
                       "--layout", "Stereo", "--json"])
            assert rc == 0, sweep
            capsys.readouterr()

    def test_sweep_without_placeholder_rejected(self, wav_file, tmp_path, capsys):
        """Review regression: without '{i}' every sweep value would
        silently overwrite the same output file."""
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "same.wav"),
                   "--sweep", "diffusion=0.2,0.8"])
        assert rc == 2
        assert "{i}" in capsys.readouterr().err

    def test_sweep_format_spec_placeholder_accepted(self, wav_file, tmp_path, capsys):
        """ADVICE r2: a format-spec placeholder like {i:03d} is usable and
        must pass the guard (checked behaviorally, not by substring)."""
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "out_{i:03d}.wav"),
                   "--sweep", "diffusion=0.2,0.8"])
        assert rc == 0
        assert (tmp_path / "out_000.wav").exists()
        assert (tmp_path / "out_001.wav").exists()

    def test_stream_plus_sweep_rejected(self, wav_file, tmp_path, capsys):
        """--stream must not be silently dropped by the sweep branch."""
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "x{i}.wav"), "--stream",
                   "--sweep", "diffusion=0.2,0.8"])
        assert rc == 2
        assert "--stream" in capsys.readouterr().err

    def test_stream_writes_device_quantized_wav(self, wav_file, tmp_path, capsys):
        """The --stream branch quantizes PCM16 on device; the written WAV
        must be bit-identical to the host-quantized float render."""
        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.cli.render import main
        from audio_raytracing_studio_tpu.parallel.streaming import render_streaming
        from audio_raytracing_studio_tpu.utils import wavio

        out_path = tmp_path / "s.wav"
        rc = main([wav_file, str(out_path), "--stream", "--seed", "3",
                   "--bass-gain", "1.6", "--chunk-seconds", "0.4"])
        assert rc == 0
        got, rate = wavio.read(out_path)

        audio, in_rate = wavio.read(wav_file)
        from audio_raytracing_studio_tpu.params import RenderParams

        ref_float = render_streaming(
            audio, in_rate, RenderParams(bass_gain=1.6), seed=3,
            chunk_seconds=0.4,
            fast_filters=False,  # the CLI --stream contract is exact (r5)
        )
        want = wavio.decode_pcm16(
            wavio.encode_pcm16(
                np.clip(ref_float, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
            )
        )
        assert rate == in_rate
        assert np.array_equal(got, want)


class TestRenderDir:
    def test_directory_batch(self, tmp_path, rng, capsys):
        from audio_raytracing_studio_tpu.cli.render_dir import main

        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        rate = 16000
        for i in range(3):
            t = np.arange(int((0.2 + 0.05 * i) * rate)) / rate
            wavio.write(in_dir / f"clip{i}.wav",
                        (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32), rate)
        rc = main([str(in_dir), str(out_dir), "--layout", "Stereo",
                   "--room-size", "50", "--batch", "2", "--json"])
        assert rc == 0
        import json as _json
        summary = _json.loads(capsys.readouterr().out)
        assert len(summary["clips"]) == 3
        assert summary["realtime_factor"] > 0
        for i in range(3):
            data, r = wavio.read(out_dir / f"clip{i}.wav")
            assert r == rate and data.shape[1] == 2

    def test_empty_dir(self, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render_dir import main

        (tmp_path / "empty").mkdir()
        rc = main([str(tmp_path / "empty"), str(tmp_path / "o"), "--layout", "Stereo"])
        assert rc == 1

    def test_file_as_input_dir_is_clean_error(self, tmp_path, capsys):
        """A FILE where the input directory belongs must be the CLI error
        contract ('error: ...' + exit 1), not a NotADirectoryError
        traceback (fuzz-found, cli mode seed 1200004). Same for an output
        path that cannot be created."""
        from audio_raytracing_studio_tpu.cli.render_dir import main

        f = tmp_path / "clip.wav"
        wavio.write(f, np.zeros(256, np.float32), 8000)
        rc = main([str(f), str(tmp_path / "o"), "--layout", "Stereo"])
        assert rc == 1
        assert "error: cannot list" in capsys.readouterr().err
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        wavio.write(in_dir / "a.wav", np.zeros(256, np.float32), 8000)
        rc = main([str(in_dir), str(f / "sub"), "--layout", "Stereo"])
        assert rc == 1
        assert "error: cannot create" in capsys.readouterr().err

    def test_eq_group_rerouted_when_decode_shorter_than_header(
        self, tmp_path, capsys, monkeypatch
    ):
        """Lossy headers can OVER-declare frames; the short decode then
        sits zero-padded in its header-length bucket (review finding: the
        >1e-3-class padded circular EQ).  render_dir hands render_batch the
        DECODED lengths, whose length-dynamic exact EQ keys on the true
        length — so the output must equal the unpadded solo render of the
        decoded samples."""
        from audio_raytracing_studio_tpu.cli import render_dir
        from audio_raytracing_studio_tpu.models import pipeline
        from audio_raytracing_studio_tpu.params import RenderParams

        in_dir, out_dir = tmp_path / "in", tmp_path / "out"
        in_dir.mkdir()
        rate, n, short = 8000, 4100, 777
        for k, name in enumerate(("a.wav", "b.wav")):
            x = (0.3 * np.random.default_rng(k).standard_normal(n)).astype(
                np.float32
            )
            wavio.write(in_dir / name, x, rate)

        real_read = wavio.read

        def fake_read(path, *a, **kw):
            data, r = real_read(path, *a, **kw)
            if str(path).endswith("a.wav"):
                data = data[:-short]  # decoder delivers less than the header
            return data, r

        monkeypatch.setattr(render_dir.wavio, "read", fake_read)
        rc = render_dir.main([
            str(in_dir), str(out_dir), "--layout", "Stereo",
            "--bass-gain", "1.6", "--batch", "4",
        ])
        assert rc == 0
        p = RenderParams(target_layout="Stereo", bass_gain=1.6)
        # ground truth renders the PCM16-decoded samples the CLI saw (the
        # conditional normalization is threshold-sensitive, PARITY.md §6)
        for name, seed, data in (
            ("a.wav", 0, real_read(in_dir / "a.wav")[0][:-short]),
            ("b.wav", 1, real_read(in_dir / "b.wav")[0]),
        ):
            got, r = real_read(out_dir / name)
            solo = np.clip(
                np.asarray(pipeline.render(
                    data, rate, p, seed=seed, fast_filters=True
                )),
                -1, 1,
            )
            assert got.shape == solo.shape, (name, got.shape, solo.shape)
            np.testing.assert_allclose(
                got, solo, atol=2e-4 + 1 / 32768, err_msg=name
            )

    def test_same_stem_inputs_do_not_collide(self, tmp_path, capsys):
        """song.wav and song.mp3 both map to a .wav output — the second must
        uniquify, not silently overwrite the first from a pool thread."""
        from audio_raytracing_studio_tpu.cli.render_dir import main
        from audio_raytracing_studio_tpu.utils import mp3io

        if not (mp3io.decode_available() and mp3io.encode_available()):
            pytest.skip("libmpg123/libmp3lame not present")
        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        rate = 16000
        t = np.arange(rate // 4) / rate
        sig = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        wavio.write(in_dir / "song.wav", sig, rate)
        mp3io.write(in_dir / "song.mp3", sig, rate)
        rc = main([str(in_dir), str(out_dir), "--layout", "Stereo",
                   "--room-size", "50", "--json"])
        assert rc == 0
        import json as _json

        summary = _json.loads(capsys.readouterr().out)
        outputs = sorted(os.path.basename(c["output"]) for c in summary["clips"])
        assert len(set(outputs)) == 2, outputs
        assert "song.wav" in outputs and "song_1.wav" in outputs

    def test_no_metrics_flags_skip_meter_pass(self, tmp_path, capsys, monkeypatch):
        """Without --metrics/--json the on-device meter pass must not run
        (cli/render's rule: only pay for numbers that are reported)."""
        from audio_raytracing_studio_tpu.cli import render_dir

        seen = {}
        from audio_raytracing_studio_tpu.parallel import sharding as sh

        real = sh.render_batch

        def spy(*a, **k):
            seen["with_metrics"] = k.get("with_metrics", False)
            return real(*a, **k)

        monkeypatch.setattr(
            "audio_raytracing_studio_tpu.parallel.sharding.render_batch", spy
        )
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        rate = 16000
        t = np.arange(rate // 4) / rate
        wavio.write(in_dir / "a.wav",
                    (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), rate)
        rc = render_dir.main([str(in_dir), str(tmp_path / "o"),
                              "--layout", "Stereo", "--room-size", "50"])
        assert rc == 0
        assert seen["with_metrics"] is False

    def test_unknown_length_probe_skips_not_silence(self, tmp_path, capsys,
                                                    monkeypatch):
        """A probe reporting frames=0 (Ogg without an EOS granule, unscannable
        MP3) must SKIP the clip with a diagnostic — not bucket it to length 0
        and write a silent output file."""
        from audio_raytracing_studio_tpu.cli import render_dir

        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        rate = 16000
        t = np.arange(int(0.25 * rate)) / rate
        sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        wavio.write(in_dir / "good.wav", sig, rate)
        wavio.write(in_dir / "nolen.wav", sig, rate)

        real_probe = wavio.probe

        def fake_probe(path):
            meta = real_probe(path)
            if os.path.basename(str(path)) == "nolen.wav":
                meta["frames"] = 0
            return meta

        monkeypatch.setattr(render_dir.wavio, "probe", fake_probe)
        rc = render_dir.main([str(in_dir), str(out_dir), "--layout", "Stereo",
                              "--room-size", "50"])
        captured = capsys.readouterr()
        assert rc == 0
        assert "skipping nolen.wav" in captured.err
        assert (out_dir / "good.wav").exists()
        assert not (out_dir / "nolen.wav").exists()

    def test_mixed_formats_directory(self, tmp_path, rng, capsys):
        """WAV + FLAC + AIFF inputs in one directory all render; FLAC output
        keeps its container, AIFF comes back as WAV."""
        import math

        from audio_raytracing_studio_tpu.cli.render_dir import main
        from audio_raytracing_studio_tpu.utils import flacio

        in_dir = tmp_path / "in"
        out_dir = tmp_path / "out"
        in_dir.mkdir()
        rate = 16000
        t = np.arange(int(0.25 * rate)) / rate
        sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        wavio.write(in_dir / "a.wav", sig, rate)
        flacio.write(in_dir / "b.flac", sig, rate)
        # minimal big-endian AIFF
        vals = np.clip(np.round(sig * 32767), -32768, 32767).astype(">i2")[:, None]
        e = math.floor(math.log2(rate))
        f80 = (16383 + e).to_bytes(2, "big") + int(rate * 2 ** (63 - e)).to_bytes(8, "big")
        comm = (1).to_bytes(2, "big") + len(vals).to_bytes(4, "big") + (16).to_bytes(2, "big") + f80
        ssnd = bytes(8) + vals.tobytes()
        body = b"COMM" + len(comm).to_bytes(4, "big") + comm
        body += b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
        (in_dir / "c.aiff").write_bytes(
            b"FORM" + (4 + len(body)).to_bytes(4, "big") + b"AIFF" + body
        )
        rc = main([str(in_dir), str(out_dir), "--layout", "Stereo",
                   "--room-size", "50", "--batch", "3", "--json"])
        assert rc == 0
        import json as _json
        summary = _json.loads(capsys.readouterr().out)
        assert len(summary["clips"]) == 3
        assert (out_dir / "a.wav").exists()
        assert (out_dir / "b.flac").exists()  # FLAC in → FLAC out
        assert (out_dir / "c.wav").exists()   # AIFF in → WAV out
        for f in ("a.wav", "b.flac", "c.wav"):
            data, r = wavio.read(out_dir / f)
            assert r == rate and data.shape[1] == 2


class TestCLIErrorContracts:
    """Review round: every render branch keeps the 'error: …' + exit-code
    contract instead of leaking tracebacks, metrics are only computed when
    reported, --json stays RFC-8259-valid, and --binaural metrics describe
    the stereo file actually written."""

    def test_nonfinite_flag_values_clean_error(self, wav_file, tmp_path, capsys):
        """argparse type=float parses 'nan'/'inf'; NaN diffusion was an
        int(NaN) ValueError traceback out of render_dir (fuzz cli mode seed
        1220091) and NaN positions render silent garbage — both CLIs reject
        non-finite flag values at the boundary with exit 2."""
        from audio_raytracing_studio_tpu.cli.render import main as render_main
        from audio_raytracing_studio_tpu.cli.render_dir import main as dir_main

        rc = render_main([wav_file, str(tmp_path / "o.wav"), "--x", "inf"])
        assert rc == 2
        assert "must be finite" in capsys.readouterr().err
        in_dir = tmp_path / "din"
        in_dir.mkdir()
        import shutil

        shutil.copy(wav_file, in_dir / "a.wav")
        rc = dir_main([str(in_dir), str(tmp_path / "dout"),
                       "--diffusion", "nan"])
        assert rc == 2
        assert "must be finite" in capsys.readouterr().err

    def test_missing_preset_clean_error(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main

        rc = main([wav_file, str(tmp_path / "o.wav"),
                   "--preset", "does_not_exist_v4.json",
                   "--preset-dir", str(tmp_path)])
        assert rc == 2
        assert "error:" in capsys.readouterr().err

    def test_external_mode_without_ir_clean_error(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main
        from audio_raytracing_studio_tpu.params import RenderParams
        from audio_raytracing_studio_tpu.utils.presets import PresetStore

        store = PresetStore(str(tmp_path))
        store.ensure_dir()
        _, fname = store.save("ext", RenderParams(use_external_ir=True))
        rc = main([wav_file, str(tmp_path / "o.wav"),
                   "--preset", fname, "--preset-dir", str(tmp_path)])
        assert rc == 2
        err = capsys.readouterr().err
        assert "error:" in err and "external_ir" in err

    def test_json_is_parseable_for_silent_input(self, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main
        from audio_raytracing_studio_tpu.utils import wavio as _w

        silent = tmp_path / "silence.wav"
        _w.write(silent, np.zeros(4000, dtype=np.float32), 8000)
        out = tmp_path / "o.wav"
        rc = main([str(silent), str(out), "--layout", "Stereo",
                   "--room-size", "50", "--json"])
        assert rc == 0
        parsed = json.loads(capsys.readouterr().out)  # '-Infinity' would raise
        assert parsed[0]["metrics"]["lufs"] == "-inf"

    def test_binaural_metrics_describe_written_file(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.analysis.metrics import (
            calculate_audio_metrics,
        )
        from audio_raytracing_studio_tpu.cli.render import main
        from audio_raytracing_studio_tpu.utils import wavio as _w

        out = tmp_path / "bin.wav"
        rc = main([wav_file, str(out), "--layout", "5.1 (Standard)",
                   "--room-size", "50", "--binaural", "--json"])
        assert rc == 0
        reported = json.loads(capsys.readouterr().out)[0]["metrics"]
        data, rate = _w.read(str(out))
        assert data.shape[1] == 2  # binaural stereo was written
        measured = calculate_audio_metrics(data, rate)
        # PCM16 quantization of the written file costs a hair of precision
        assert abs(measured["lufs"] - reported["lufs"]) < 0.1
        assert abs(measured["rms_dbfs"] - reported["rms_dbfs"]) < 0.1

    def test_no_metrics_flag_skips_metrics(self, wav_file, tmp_path, capsys):
        from audio_raytracing_studio_tpu.cli.render import main

        out = tmp_path / "plain.wav"
        rc = main([wav_file, str(out), "--layout", "Stereo", "--room-size", "50"])
        assert rc == 0 and out.exists()
        assert "LUFS" not in capsys.readouterr().out


class TestWavioEdge:
    def test_f80_overflow_exponent_is_valueerror(self, tmp_path):
        """A corrupt AIFF COMM exponent must raise ValueError (the CLI /
        directory-probe error contract), not OverflowError."""
        import struct

        from audio_raytracing_studio_tpu.utils import wavio as _w

        # COMM with extended-float exponent 0x7FFE → 2.0**huge
        comm = struct.pack(">hLh", 1, 10, 16) + bytes([0x7F, 0xFE] + [0x80] + [0] * 7)
        ssnd = b"\x00" * 8 + b"\x00\x01" * 10
        chunks = (
            b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
        )
        form = b"AIFF" + chunks
        p = tmp_path / "bad_rate.aiff"
        p.write_bytes(b"FORM" + struct.pack(">L", len(form)) + form)
        with pytest.raises(ValueError):
            _w.read(str(p))
