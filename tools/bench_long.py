"""Secondary TPU benchmarks (recorded in BENCH_HISTORY.md, not the driver line):

  long      — streaming render of a genuinely long clip (default 30 min @
              48 kHz — impossible as one whole-signal FFT) on one chip:
              realtime factor with bounded HBM (VERDICT item 4).
  pallas    — batched Cathedral render (room_size=600, ~7.2 s IRs, past the
              old 2^18 bank ceiling) with ir_backend="pallas" vs "jnp"
              (VERDICT item 2 evidence).

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


def bench_long(minutes: float) -> dict:
    import numpy as np

    from audio_raytracing_studio_tpu.parallel.streaming import render_streaming
    from audio_raytracing_studio_tpu.params import RenderParams

    rate = 48000
    seconds = minutes * 60.0
    n = int(seconds * rate)
    # deterministic varied content, built in chunks to keep host RAM modest
    t0 = np.arange(n, dtype=np.float64) / rate
    x = (0.25 * np.sin(2 * np.pi * 220.0 * t0)
         + 0.1 * np.sin(2 * np.pi * 3.1 * t0) * np.sin(2 * np.pi * 880.0 * t0)
         ).astype(np.float32)
    del t0
    p = RenderParams(target_layout="5.1 (Standard)", room_size=200.0)

    # warm at FULL shape: finish/meter executables depend on the total
    # buffer length, so a short warm run would leave compiles in the timing
    render_streaming(x, rate, p, seed=1, chunk_seconds=30.0, with_metrics=True)

    start = time.perf_counter()
    out, metrics = render_streaming(
        x, rate, p, seed=1, chunk_seconds=30.0, with_metrics=True
    )
    wall = time.perf_counter() - start
    return {
        "metric": "streaming_long_render_realtime_factor",
        "minutes": minutes,
        "rate": rate,
        "layout": "5.1 (Standard)",
        "value": round(seconds / wall, 2),
        "wall_s": round(wall, 2),
        "out_shape": list(out.shape),
        "metrics": metrics,
    }


def bench_pallas(batch: int, iters: int = 3) -> dict:
    import numpy as np

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

    results = {}
    for backend in ("pallas", "jnp"):
        seeds = list(range(batch))
        sharding.render_batch(clips, rate, p, seeds=seeds, ir_backend=backend)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            sharding.render_batch(clips, rate, p, seeds=seeds, ir_backend=backend)
        wall = (time.perf_counter() - t0) / iters
        results[backend] = round(batch * dur_s / wall, 2)
    return {
        "metric": "cathedral600_60s48k_realtime_factor",
        "batch": batch,
        "ir_backend_pallas": results["pallas"],
        "ir_backend_jnp": results["jnp"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all", choices=["long", "pallas", "all"])
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from audio_raytracing_studio_tpu.utils.profiling import enable_compilation_cache
    from audio_raytracing_studio_tpu.utils.runtime import ensure_backend

    try:
        enable_compilation_cache()
    except Exception:
        pass
    print(json.dumps({"backend": ensure_backend()}), flush=True)
    if args.which in ("long", "all"):
        print(json.dumps(bench_long(args.minutes)), flush=True)
    if args.which in ("pallas", "all"):
        print(json.dumps(bench_pallas(args.batch)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
