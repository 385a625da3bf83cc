"""Hardware validation of the round-2 kernels on the real TPU chip.

Runs the checks that CI can only approximate (the interpreter executes the
same code, but Mosaic compilation is the production path):
  1. fused Pallas RIR bank (hash mode, column-block grid) vs the jnp
     hash-draw path — including a Cathedral IR past the old 2^18 ceiling,
  2. seed sensitivity + 0.9/0.7 normalization on chip,
  3. pair-packed exact circular gain vs the unpacked reference form.

Prints one JSON line per check; exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)  # the axon plugin only registers from certain directories


def main() -> int:
    import jax

    from audio_raytracing_studio_tpu.utils.runtime import ensure_backend

    backend = ensure_backend()
    # explicit backend line on EVERY path (CLAUDE.md: TPU scripts print the
    # backend — a log without it cannot prove the run happened on hardware
    # rather than a silent CPU-fallback twin)
    print(f"backend: {backend} devices: {jax.devices()}", flush=True)
    if backend != "tpu":
        print(json.dumps({"check": "backend", "ok": False, "got": backend}))
        return 1

    import numpy as np
    import jax.numpy as jnp

    from audio_raytracing_studio_tpu.ops import fftops, ir_synth
    from audio_raytracing_studio_tpu.ops.ir_synth_pallas import BLOCK_FLAT, fused_rir_bank
    from audio_raytracing_studio_tpu.params import (
        RenderParams,
        adjust_parameters_for_3d,
        compute_final_directionality_3d,
        derive_ir_geometry,
    )

    failures = 0

    def report(check: str, ok: bool, **kw):
        nonlocal failures
        failures += 0 if ok else 1
        print(json.dumps({"check": check, "ok": bool(ok), **kw}), flush=True)

    def shapes_for(p: RenderParams, rate: int):
        dur, refs, maxd, split = adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)
        direc = compute_final_directionality_3d(
            p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
        )
        g = derive_ir_geometry(rate, dur, refs, maxd, p.material, direc, split, p.diffusion)
        return ir_synth.IRShape.from_geometry(g), ir_synth.IRScalars.from_geometry(g)

    # --- 1+2: compiled hash bank, Room (small) and Cathedral (multi-block) ---
    for name, p, rate in (
        ("room_16k", RenderParams(), 16000),
        ("cathedral_600_48k", RenderParams(hall_type="Cathedral", room_size=600.0), 48000),
    ):
        shape, scalars = shapes_for(p, rate)
        seeds = np.array([5, 6], np.int32)
        e_k, l_k = map(np.asarray, fused_rir_bank(seeds, shape, scalars))
        max_err = 0.0
        for i, s in enumerate(seeds):
            d, st, nz = ir_synth.hash_draws(int(s), shape)
            e_j, l_j = map(np.asarray, ir_synth.synthesize(shape, d, st, nz, scalars))
            max_err = max(max_err, float(np.abs(e_k[i] - e_j).max()),
                          float(np.abs(l_k[i] - l_j).max()))
        norms_ok = all(
            abs(np.abs(e_k[i]).max() - 0.9) < 1e-4 and abs(np.abs(l_k[i]).max() - 0.7) < 1e-4
            for i in range(2)
        )
        report(
            f"pallas_bank_{name}",
            max_err < 1e-5 and norms_ok
            # BOTH banks must be seed-sensitive: the interpreter ignores
            # prng seeds (CLAUDE.md), so a hardware regression that froze
            # either stream would be invisible to CPU CI
            and not np.array_equal(e_k[0], e_k[1])
            and not np.array_equal(l_k[0], l_k[1]),
            ir_length=shape.length,
            blocks=-(-shape.length // BLOCK_FLAT),
            max_err_vs_jnp=max_err,
        )

    # --- 3: pair-packed exact circular gain on chip (jitted — eager complex
    # arithmetic is UNIMPLEMENTED on the axon backend; production paths are
    # always under jit) ---
    rng = np.random.default_rng(9)
    n = 35555
    x = (rng.standard_normal((2, n)) * 0.4).astype(np.float32)
    g = (0.3 + rng.random(n // 2 + 1)).astype(np.float32)
    y = np.asarray(jax.jit(fftops.apply_circular_gain)(jnp.asarray(x), jnp.asarray(g)))

    @jax.jit
    def unpacked(xx, gg):
        return fftops.irfft_exact(fftops.rfft_exact(xx, n) * gg, n)

    ref = np.asarray(unpacked(jnp.asarray(x), jnp.asarray(g)))
    err = float(np.abs(y - ref).max())
    report("pair_packed_gain", err < 1e-5, max_err=err)

    # --- 4: device-side PCM16 quantization + int16 device→host transfer
    # (round 3): the axon backend has dtype-specific transfer gaps
    # (complex64 is UNIMPLEMENTED both ways) — prove int16 readback works
    # and the quantized bits equal the host contract exactly ---
    from audio_raytracing_studio_tpu import config
    from audio_raytracing_studio_tpu.models.pipeline import quantize_pcm16
    from audio_raytracing_studio_tpu.utils import wavio

    xq = (rng.standard_normal((6, 48000)).astype(np.float32) * 0.7)
    xq[0, :3] = [1.5, -1.5, 0.99995]  # exercise saturation + clip edge
    got = np.asarray(jax.jit(quantize_pcm16)(jnp.asarray(xq)))
    want = wavio.encode_pcm16(np.clip(xq, -config.OUTPUT_CLIP, config.OUTPUT_CLIP))
    report(
        "device_pcm16_int16_transfer",
        got.dtype == np.int16 and np.array_equal(got, want),
        mismatches=int((got != want).sum()),
    )

    # --- 5: masked on-device metering (round 3) vs metering the trimmed
    # signal — the render_dir batch-bucket path ---
    from audio_raytracing_studio_tpu.metering import kweighting as kw
    from audio_raytracing_studio_tpu.metering import loudness as jl

    rate_m = 16000
    sig = (0.4 * np.sin(2 * np.pi * 330 * np.arange(int(1.3 * rate_m)) / rate_m)
           ).astype(np.float32)[None, :]
    valid = sig.shape[1]
    padded = np.concatenate([sig, np.zeros((1, 5000), np.float32)], axis=1)
    masked_fn = jax.jit(
        lambda d, vl, vb: jl.audio_metrics_masked(d, rate_m, vl, vb)
    )
    masked = masked_fn(
        jnp.asarray(padded), jnp.int32(valid),
        jnp.int32(kw.block_count(valid, rate_m)),
    )
    trimmed = jl.audio_metrics(jnp.asarray(sig), rate_m)
    d_lufs = abs(float(masked["lufs"]) - float(trimmed["lufs"]))
    d_rms = abs(float(masked["rms_dbfs"]) - float(trimmed["rms_dbfs"]))
    report("masked_metrics_on_chip", d_lufs < 1e-3 and d_rms < 1e-3,
           d_lufs=d_lufs, d_rms=d_rms)

    # --- 6: length-DYNAMIC exact EQ (round 3 continuation): traced-n0
    # int32-modular chirps compiled by XLA:TPU — the uint32 modular
    # doubling/squaring must stay exact on hardware, and the full padded
    # batch must match the unpadded solo render ---
    from audio_raytracing_studio_tpu.ops import filters
    from audio_raytracing_studio_tpu.parallel import sharding

    rate_e = 16000
    L, n0 = 24000, 19777
    xe = (0.4 * rng.standard_normal((2, L))).astype(np.float32)
    xe[:, n0:] = 0.0
    dyn = filters.eq_dyn_host(n0, rate_e)
    got_dyn = np.asarray(jax.jit(filters.apply_shelf_eq_dynamic)(
        jnp.asarray(xe), jnp.float32(1.7), jnp.float32(0.4), dyn
    ))
    ref_static = np.asarray(jax.jit(
        lambda s, b, t: filters.apply_shelf_eq(s, rate_e, b, t)
    )(jnp.asarray(xe[:, :n0]), jnp.float32(1.7), jnp.float32(0.4)))
    err_op = float(np.abs(got_dyn[:, :n0] - ref_static).max())
    tail = float(np.abs(got_dyn[:, n0:]).max()) if n0 < L else 0.0
    report("dynamic_eq_op_on_chip", err_op < 1e-5 and tail == 0.0,
           max_err_vs_static=err_op, tail=tail)

    n_clip, n_bucket = 5123, 8000
    clip_e = (0.4 * np.sin(2 * np.pi * 330.0 * np.arange(n_clip) / rate_e)
              ).astype(np.float32)
    padded_e = np.zeros((1, n_bucket), np.float32)
    padded_e[0, :n_clip] = clip_e
    p_eq = RenderParams(target_layout="Stereo", room_size=60.0,
                        bass_gain=1.7, treble_gain=0.5)
    from audio_raytracing_studio_tpu.models import pipeline as mpipe

    out_b = sharding.render_batch(
        padded_e, rate_e, [p_eq], seeds=[11], clip_lengths=[n_clip]
    )[0]
    solo_e = np.asarray(mpipe.render(clip_e, rate_e, p_eq, seed=11))
    err_b = float(np.abs(out_b[: solo_e.shape[0]] - solo_e).max())
    report("dynamic_eq_padded_batch_on_chip", err_b < 1e-4,
           max_err_vs_solo=err_b)

    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
