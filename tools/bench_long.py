"""Secondary TPU benchmarks (recorded in BENCH_HISTORY.md, not the driver line):

  long      — streaming render of a genuinely long clip (default 30 min @
              48 kHz — impossible as one whole-signal FFT) on one chip.
              Reports TWO realtime factors: `compute` (output stays on
              device; metrics readbacks force the full render — bench.py's
              scalar-sync methodology) and `end_to_end` (including the bulk
              device→host result transfer, which through this image's
              remote axon tunnel is bandwidth-bound at ~10-20 MB/s and
              dominates; on a co-located TPU VM it is DMA-speed).
  pallas    — batched Cathedral render (room_size=600, ~7.2 s IRs, past the
              old 2^18 bank ceiling) with ir_backend="pallas" vs "jnp",
              timed on the jitted batched graph with a scalar-readback sync
              (device inputs pre-staged, same methodology as bench.py).

Usage: python tools/bench_long.py [long|pallas|all] [--minutes N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def _make_long_clip(minutes: float, rate: int):
    import numpy as np

    n = int(minutes * 60.0 * rate)
    t0 = np.arange(n, dtype=np.float64) / rate
    x = (0.25 * np.sin(2 * np.pi * 220.0 * t0)
         + 0.1 * np.sin(2 * np.pi * 3.1 * t0) * np.sin(2 * np.pi * 880.0 * t0)
         ).astype(np.float32)
    return x


def bench_long(minutes: float, bass: float = 1.0, treble: float = 1.0,
               exact: bool = False) -> dict:
    """30-min streaming render timings.  ``exact`` runs fast_filters=False:
    the reference's exact-length air transform via the blockwise traced-n0
    Bluestein over the separated late stream (round-5) — the on-chip cost
    of bit-honest streaming semantics vs the conv-grid default."""
    from audio_raytracing_studio_tpu.parallel.streaming import render_streaming
    from audio_raytracing_studio_tpu.params import RenderParams

    rate = 48000
    seconds = minutes * 60.0
    x = _make_long_clip(minutes, rate)
    p = RenderParams(target_layout="5.1 (Standard)", room_size=200.0,
                     bass_gain=bass, treble_gain=treble)
    ff = not exact

    # warm at FULL shape: finish/meter executables depend on the total
    # buffer length, so a short warm run would leave compiles in the timing
    render_streaming(x, rate, p, seed=1, chunk_seconds=30.0,
                     with_metrics=True, return_output=False, fast_filters=ff)

    start = time.perf_counter()
    _none, metrics = render_streaming(
        x, rate, p, seed=1, chunk_seconds=30.0,
        with_metrics=True, return_output=False, fast_filters=ff,
    )
    compute_wall = time.perf_counter() - start

    start = time.perf_counter()
    out, _m = render_streaming(
        x, rate, p, seed=1, chunk_seconds=30.0, with_metrics=True,
        fast_filters=ff,
    )
    e2e_wall = time.perf_counter() - start

    # device-side PCM16 quantization: int16 result at half the transfer
    # (bit-identical to host-quantizing `out` — asserted below)
    start = time.perf_counter()
    out16, _m = render_streaming(
        x, rate, p, seed=1, chunk_seconds=30.0, with_metrics=True,
        pcm16_output=True, fast_filters=ff,
    )
    e2e16_wall = time.perf_counter() - start
    import numpy as np

    from audio_raytracing_studio_tpu import config
    from audio_raytracing_studio_tpu.utils import wavio

    host16 = wavio.encode_pcm16(
        np.clip(out, -config.OUTPUT_CLIP, config.OUTPUT_CLIP)
    )
    pcm16_exact = bool(np.array_equal(out16, host16))
    return {
        "metric": "streaming_long_render_realtime_factor",
        "filters": "exact" if exact else "fast",
        "minutes": minutes,
        "rate": rate,
        "layout": "5.1 (Standard)",
        "compute": round(seconds / compute_wall, 2),
        "compute_wall_s": round(compute_wall, 2),
        "end_to_end": round(seconds / e2e_wall, 2),
        "end_to_end_wall_s": round(e2e_wall, 2),
        "end_to_end_pcm16": round(seconds / e2e16_wall, 2),
        "end_to_end_pcm16_wall_s": round(e2e16_wall, 2),
        "pcm16_bit_identical": pcm16_exact,
        "out_shape": list(out.shape),
        "result_mb": round(out.nbytes / 1e6, 1),
        "result_pcm16_mb": round(out16.nbytes / 1e6, 1),
        "metrics": metrics,
    }


def bench_pallas(batch: int, iters: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_raytracing_studio_tpu.models import pipeline
    from audio_raytracing_studio_tpu.parallel import sharding
    from audio_raytracing_studio_tpu.params import RenderParams

    rate = 48000
    dur_s = 60.0
    t = np.arange(int(dur_s * rate)) / rate
    clips = np.stack(
        [(0.3 * np.sin(2 * np.pi * (200.0 + 11.0 * i) * t)).astype(np.float32)
         for i in range(batch)]
    )
    p = RenderParams(hall_type="Cathedral", room_size=600.0, target_layout="Stereo")

    # pre-stage device inputs once (bench.py methodology): the timing
    # measures the compiled batched graph + a scalar-readback sync, not the
    # dev tunnel's host↔device bandwidth.
    clips_cn = np.stack([pipeline._ensure_stereo_host(c).T for c in clips])
    setup = pipeline.build_internal_setup(p, rate, clips.shape[1], fast_filters=True)
    audio_bcn = jnp.asarray(clips_cn)
    keys = jnp.arange(batch, dtype=jnp.int32)
    ir_scalars = jax.tree.map(lambda v: jnp.broadcast_to(v, (batch,)), setup.ir_scalars)
    mix_scalars = jax.tree.map(lambda v: jnp.broadcast_to(v, (batch,)), setup.mix_scalars)

    results = {}
    for backend, fn in (
        ("pallas", sharding._batched_internal_pallas),
        ("jnp", sharding._batched_internal),
    ):
        def run():
            out, _ = fn(
                audio_bcn, keys, ir_scalars, mix_scalars,
                ir_shape=setup.ir_shape, spec=setup.spec, with_metrics=False,
            )
            return float(jnp.sum(out))  # forces the full device render

        run()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        wall = (time.perf_counter() - t0) / iters
        results[backend] = round(batch * dur_s / wall, 2)
    return {
        "metric": "cathedral600_60s48k_compute_realtime_factor",
        "batch": batch,
        "ir_backend_pallas": results["pallas"],
        "ir_backend_jnp": results["jnp"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all", choices=["long", "pallas", "all"])
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bass", type=float, default=1.0)
    ap.add_argument("--treble", type=float, default=1.0)
    ap.add_argument("--exact", action="store_true",
                    help="fast_filters=False: exact-length streaming air")
    args = ap.parse_args()

    from audio_raytracing_studio_tpu.utils.profiling import enable_compilation_cache
    from audio_raytracing_studio_tpu.utils.runtime import ensure_backend

    try:
        enable_compilation_cache()
    except Exception:
        pass
    backend = ensure_backend()
    print(json.dumps({"backend": backend}), flush=True)
    if backend != "tpu":
        # a silent CPU fallback would launch multi-hour 30-min streaming
        # renders on the 1-core host AND starve any real TPU process's
        # dispatch loop (CLAUDE.md) — same guard as tpu_validate
        print(json.dumps({"error": f"needs the TPU backend, got {backend!r}"}))
        return 1
    if args.which in ("long", "all"):
        print(json.dumps(
            bench_long(args.minutes, args.bass, args.treble, args.exact)
        ), flush=True)
    if args.which in ("pallas", "all"):
        print(json.dumps(bench_pallas(args.batch)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
