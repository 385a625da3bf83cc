"""Multi-device paths on the 8-device virtual CPU mesh: batched SPMD render,
partitioned overlap-add convolution with ring halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import fftconvolve

from audio_raytracing_studio_tpu.models import pipeline
from audio_raytracing_studio_tpu.parallel import mesh as meshlib
from audio_raytracing_studio_tpu.parallel import partitioned_conv, sharding
from audio_raytracing_studio_tpu.params import RenderParams


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def short_clips(rng, batch, seconds=0.3, rate=16000):
    t = np.arange(int(seconds * rate)) / rate
    clips = [
        (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        for i in range(batch)
    ]
    return np.stack(clips), rate


class TestPartitionedConv:
    @pytest.mark.parametrize("n,l", [(4096, 1000), (8192, 9000), (2048, 100)])
    def test_matches_fftconvolve(self, rng, eight_devices, n, l):
        m = meshlib.make_mesh(data=1, block=8)
        sig = rng.standard_normal((2, n)).astype(np.float32) * 0.3
        ker = rng.standard_normal((2, l)).astype(np.float32) * 0.05

        n_pad = partitioned_conv.padded_length(n, l, 8)
        sig_padded = np.pad(sig, ((0, 0), (0, n_pad - n)))
        out = np.asarray(
            partitioned_conv.partitioned_convolve(
                jnp.asarray(sig_padded), jnp.asarray(ker), m
            )
        )
        assert out.shape == (2, 2, n_pad)
        for ki in range(2):
            for ci in range(2):
                ref = fftconvolve(sig[ci], ker[ki], mode="full")
                np.testing.assert_allclose(
                    out[ki, ci, : n + l - 1], ref, atol=2e-4
                )
                # beyond the linear-conv support everything is zero
                assert np.max(np.abs(out[ki, ci, n + l - 1 :])) < 1e-6

    def test_tail_longer_than_block(self, rng, eight_devices):
        """L−1 spanning multiple blocks exercises multi-hop ring forwarding."""
        m = meshlib.make_mesh(data=1, block=8)
        n, l = 1024, 700  # block=216, tail 699 → 4 hops
        sig = rng.standard_normal((1, n)).astype(np.float32)
        ker = rng.standard_normal((1, l)).astype(np.float32)
        n_pad = partitioned_conv.padded_length(n, l, 8)
        out = np.asarray(
            partitioned_conv.partitioned_convolve(
                jnp.asarray(np.pad(sig, ((0, 0), (0, n_pad - n)))), jnp.asarray(ker), m
            )
        )
        ref = fftconvolve(sig[0], ker[0], mode="full")
        np.testing.assert_allclose(out[0, 0, : n + l - 1], ref, atol=2e-4)


class TestBatchedRender:
    def test_matches_single_renders(self, rng):
        clips, rate = short_clips(rng, 4)
        p = RenderParams(target_layout="Stereo", room_size=50.0)
        batch_out = sharding.render_batch(clips, rate, p, seeds=[0, 1, 2, 3])
        for i in range(4):
            single = pipeline.render(clips[i], rate, p, seed=i)
            np.testing.assert_allclose(batch_out[i], single, atol=2e-5)

    def test_value_parameter_sweep(self, rng):
        """Per-clip diffusion/position sweep in one compiled program."""
        clips, rate = short_clips(rng, 4)
        params = [
            RenderParams(target_layout="Stereo", diffusion=d, x_pos=x)
            for d, x in [(0.1, 0.2), (0.5, 0.5), (0.9, 0.8), (0.3, 0.9)]
        ]
        out = sharding.render_batch(clips, rate, params, seeds=[7] * 4)
        # sweep actually changes the audio
        assert not np.allclose(out[0], out[1])
        # and matches the equivalent single renders
        for i, p in enumerate(params):
            single = pipeline.render(clips[i], rate, p, seed=7)
            np.testing.assert_allclose(out[i], single, atol=2e-5)

    def test_external_mesh_batch_divisibility_rejected(self, rng, eight_devices):
        """The external-IR mesh path must give the same clear ValueError as
        the internal path for an uneven batch — not a low-level sharding
        error from device_put."""
        clips, rate = short_clips(rng, 3)
        ir = rng.standard_normal((400, 2)).astype(np.float32)
        m = meshlib.make_mesh(data=8, block=1)
        p = RenderParams(use_external_ir=True, target_layout="Stereo")
        with pytest.raises(ValueError, match="not divisible"):
            sharding.render_batch(clips, rate, p, device_mesh=m, external_ir=ir)

    def test_shape_mismatch_rejected(self, rng):
        clips, rate = short_clips(rng, 2)
        params = [
            RenderParams(target_layout="Stereo", room_size=50.0),
            RenderParams(target_layout="Stereo", room_size=500.0),
        ]
        with pytest.raises(ValueError, match="bucket"):
            sharding.render_batch(clips, rate, params)

    def test_sharded_over_mesh(self, rng, eight_devices):
        clips, rate = short_clips(rng, 8)
        m = meshlib.make_mesh(data=8, block=1)
        p = RenderParams(target_layout="5.1 (Standard)", room_size=50.0)
        out = sharding.render_batch(clips, rate, p, device_mesh=m)
        assert out.shape[0] == 8 and out.shape[2] == 6
        single = pipeline.render(clips[3], rate, p, seed=3)
        np.testing.assert_allclose(out[3], single, atol=2e-5)

    def test_with_metrics(self, rng):
        clips, rate = short_clips(rng, 2, seconds=1.0)
        p = RenderParams(target_layout="Stereo", room_size=50.0)
        out, metrics = sharding.render_batch(clips, rate, p, with_metrics=True)
        assert len(metrics) == 2
        for m in metrics:
            assert m["true_peak_dbfs"] < 0.1
            assert np.isfinite(m["rms_dbfs"])

    def test_clip_lengths_masked_metrics(self, rng):
        """Zero-padded bucket clips meter their TRUE output span on device
        (the render_dir path) — matches metering the trimmed output."""
        from audio_raytracing_studio_tpu.metering import loudness as jl

        clips, rate = short_clips(rng, 2, seconds=1.0)
        true_lens = [clips.shape[1], int(0.62 * rate)]
        clips[1, true_lens[1]:] = 0.0
        p = RenderParams(target_layout="Stereo", room_size=50.0)
        outs, metrics = sharding.render_batch(
            clips, rate, p, seeds=[0, 1], with_metrics=True,
            clip_lengths=true_lens,
        )
        l_minus_1 = outs.shape[1] - clips.shape[1]
        for i in range(2):
            real_len = true_lens[i] + l_minus_1
            ref = jl.audio_metrics(jnp.asarray(outs[i, :real_len].T), rate)
            assert metrics[i]["lufs"] == pytest.approx(
                float(ref["lufs"]), abs=1e-3
            )
            assert metrics[i]["true_peak_dbfs"] == pytest.approx(
                float(ref["true_peak_dbfs"]), abs=1e-4
            )
            assert metrics[i]["rms_dbfs"] == pytest.approx(
                float(ref["rms_dbfs"]), abs=1e-3
            )
        # the padded clip's metrics genuinely differ from padded metering
        padded = jl.audio_metrics(jnp.asarray(outs[1].T), rate)
        assert abs(metrics[1]["rms_dbfs"] - float(padded["rms_dbfs"])) > 0.5

    def test_pcm16_output_bit_identical(self, rng):
        """Device-quantized batch output == host-quantized float output."""
        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.utils import wavio

        clips, rate = short_clips(rng, 3, seconds=0.5)
        p = RenderParams(target_layout="5.1 (Standard)", room_size=50.0)
        f = sharding.render_batch(clips, rate, p, seeds=[0, 1, 2])
        q = sharding.render_batch(
            clips, rate, p, seeds=[0, 1, 2], pcm16_output=True
        )
        assert q.dtype == np.int16 and q.shape == f.shape
        host = wavio.encode_pcm16(
            np.clip(f, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
        )
        assert np.array_equal(q, host)

    @pytest.mark.parametrize(
        "field,values",
        [
            ("bass_gain", (1.0, 1.6)),
            ("air_absorption", (0.0, 0.6)),
            ("early_level", (0.0, 0.7)),
            ("late_level", (0.0, 0.8)),
        ],
    )
    def test_value_flag_sweep_batches(self, rng, field, values):
        """Sweeps flipping value-derived stage flags (eq/air/early/late on-off)
        must batch — the flags widen batch-wide — and each clip must match
        its solo render (zero weights / identity gain curves are exact or
        roundoff-level, so the widened graph preserves per-clip semantics)."""
        clips, rate = short_clips(rng, 2, seconds=0.4)
        params = [
            RenderParams(target_layout="Stereo", room_size=50.0, **{field: v})
            for v in values
        ]
        out = sharding.render_batch(clips, rate, params, seeds=[0, 1])
        for i in range(2):
            solo = np.asarray(pipeline.render(clips[i], rate, params[i], seed=i))
            np.testing.assert_allclose(out[i], solo, atol=1e-4)

    def test_padded_eq_clip_matches_unpadded_solo(self, rng):
        """The circular shelf EQ cannot run on bucket padding (its
        brick-wall masks make padded-length EQ deviate ~1e-2 from the
        clip's true-length EQ — found by tools/fuzz_campaign.py batch
        mode).  render_batch therefore runs the EQ length-DYNAMICALLY for
        padded EQ-on clips: chirps/gain derive on device from the traced
        true length (ops.filters.apply_shelf_eq_dynamic), so every clip —
        padded or not, EQ on or off — matches its unpadded solo render
        inside ONE bucket executable."""
        clips, rate = short_clips(rng, 3, seconds=0.5)
        eq = RenderParams(
            target_layout="Stereo", room_size=50.0,
            bass_gain=2.0, treble_gain=0.4,
        )
        flat = RenderParams(target_layout="Stereo", room_size=50.0)
        params = [eq, eq, flat]
        true_lens = [clips.shape[1], clips.shape[1] - 777, clips.shape[1] - 1234]
        for b, tl in enumerate(true_lens):
            clips[b, tl:] = 0.0  # bucket padding is ZEROS by contract
        out, mets = sharding.render_batch(
            clips, rate, params, seeds=[0, 1, 2], clip_lengths=true_lens,
            with_metrics=True,
        )
        for b, (tl, p) in enumerate(zip(true_lens, params)):
            solo, sm = pipeline.render(
                clips[b, :tl], rate, p, seed=b, return_metrics=True
            )
            solo = np.asarray(solo)
            np.testing.assert_allclose(
                out[b, : solo.shape[0]], solo, atol=2e-5,
                err_msg=f"clip {b} (true len {tl})",
            )
            # beyond the true span the buffer stays zero (the dynamic EQ
            # masks its output past n0)
            assert np.all(out[b, solo.shape[0]:] == 0.0)
            for key in ("lufs", "rms_dbfs"):
                assert abs(float(mets[b][key]) - float(sm[key])) < 0.01

    def test_quantize_pcm16_nonfinite_matches_host_contract(self):
        """Device quantize mirrors the host path (app/api.py:154-157):
        clip bounds ±inf, NaN → 0 — not XLA's implementation-defined
        float→int16 of NaN."""
        import jax.numpy as jnp

        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.models.pipeline import quantize_pcm16
        from audio_raytracing_studio_tpu.utils import wavio

        x = np.array(
            [[0.0, 0.5, -0.5, 2.0, -2.0, np.nan, np.inf, -np.inf, 0.99995]],
            dtype=np.float32,
        )
        got = np.asarray(quantize_pcm16(jnp.asarray(x)))
        clipped = np.clip(x, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
        clipped = np.nan_to_num(clipped, nan=0.0, posinf=0.0, neginf=0.0)
        want = wavio.encode_pcm16(clipped)
        assert got.dtype == np.int16
        assert np.array_equal(got, want)
        assert got[0, 5] == 0  # the NaN slot specifically


class TestBatchedExternal:
    def test_external_batch_matches_single(self, rng):
        rate = 16000
        t = np.arange(rate // 2) / rate
        clips = np.stack(
            [(0.4 * np.sin(2 * np.pi * (220 + 60 * i) * t)).astype(np.float32) for i in range(3)]
        )
        ir = (rng.standard_normal((800, 2)) * 0.2).astype(np.float32)
        params = [
            RenderParams(use_external_ir=True, target_layout="Stereo", dry_wet=dw)
            for dw in (0.3, 0.6, 0.9)
        ]
        out, metrics = sharding.render_batch(
            clips, rate, params, external_ir=ir, with_metrics=True
        )
        assert out.shape == (3, clips.shape[1] + 800 - 1, 2)
        assert len(metrics) == 3
        for i, p in enumerate(params):
            single = pipeline.render(clips[i], rate, p, external_ir=ir)
            np.testing.assert_allclose(out[i], single, atol=2e-5)

    def test_external_pcm16_and_masked_metrics(self, rng):
        """The external-IR batch path supports device PCM16 and the masked
        meter too (same epilogue as the internal path)."""
        from audio_raytracing_studio_tpu import config
        from audio_raytracing_studio_tpu.metering import loudness as jl
        from audio_raytracing_studio_tpu.utils import wavio

        rate = 16000
        t = np.arange(rate // 2) / rate
        clips = np.stack(
            [(0.4 * np.sin(2 * np.pi * (220 + 60 * i) * t)).astype(np.float32)
             for i in range(2)]
        )
        true_lens = [clips.shape[1], int(0.3 * rate)]
        clips[1, true_lens[1]:] = 0.0
        ir = (rng.standard_normal((800, 2)) * 0.2).astype(np.float32)
        p = RenderParams(use_external_ir=True, target_layout="Stereo", dry_wet=0.6)
        f = sharding.render_batch(clips, rate, p, external_ir=ir)
        q, metrics = sharding.render_batch(
            clips, rate, p, external_ir=ir, with_metrics=True,
            pcm16_output=True, clip_lengths=true_lens,
        )
        assert q.dtype == np.int16
        host = wavio.encode_pcm16(
            np.clip(f, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
        )
        assert np.array_equal(q, host)
        real_len = true_lens[1] + ir.shape[0] - 1
        ref = jl.audio_metrics(jnp.asarray(f[1, :real_len].T), rate)
        assert metrics[1]["rms_dbfs"] == pytest.approx(
            float(ref["rms_dbfs"]), abs=1e-3
        )

    def test_external_layout_mismatch_rejected(self, rng):
        """Review regression: the external path silently rendered every clip
        with clip 0's layout instead of raising like the internal path."""
        rate = 16000
        clips = np.stack([np.zeros(rate // 4, np.float32)] * 2)
        ir = (rng.standard_normal((200, 2)) * 0.2).astype(np.float32)
        params = [
            RenderParams(use_external_ir=True, target_layout="Stereo"),
            RenderParams(use_external_ir=True, target_layout="5.1 (Standard)"),
        ]
        with pytest.raises(ValueError, match="target_layout"):
            sharding.render_batch(clips, rate, params, external_ir=ir)

    def test_mixed_modes_rejected(self, rng):
        rate = 16000
        clips = np.zeros((2, 1000), np.float32)
        params = [RenderParams(use_external_ir=True), RenderParams()]
        with pytest.raises(ValueError, match="mixed"):
            sharding.render_batch(clips, rate, params, external_ir=np.zeros((10, 2), np.float32))
