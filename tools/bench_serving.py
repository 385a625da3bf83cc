"""Serving-layer throughput bench: N concurrent jobs through RenderService.

Measures what a production client actually sees — end-to-end job latency
including queueing, micro-batching, the SPMD render, device→host result
transfer and per-job trimming — and how well the batcher coalesced the
burst (one dispatch per static signature is the design claim).

Protocol mirrors bench.py's honesty rules: results are forced all the way
to host numpy (no block_until_ready lies — the trimmed arrays ARE host
data), one warmup burst pays the compile before the measured burst.

Usage:
  python tools/bench_serving.py                 # TPU: 48× 60 s 48 kHz jobs
  JAX_PLATFORMS=cpu python tools/bench_serving.py --jobs 4 --seconds 2 --rate 16000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)  # the axon plugin only registers from the repo root


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bench_serving")
    ap.add_argument("--jobs", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--rate", type=int, default=48000)
    ap.add_argument("--max-batch", type=int, default=48)
    ap.add_argument("--max-wait-ms", type=float, default=200.0)
    ap.add_argument("--metrics", action="store_true")
    ap.add_argument(
        "--exact-filters", dest="fast_filters", action="store_false",
        default=True, help="bit-honest exact-length filters (default: fast)",
    )
    args = ap.parse_args(argv)

    from audio_raytracing_studio_tpu.utils.profiling import enable_compilation_cache
    from audio_raytracing_studio_tpu.utils.runtime import ensure_backend

    backend = ensure_backend()
    enable_compilation_cache()
    print(f"backend: {backend}", file=sys.stderr)

    from audio_raytracing_studio_tpu.params import RenderParams
    from audio_raytracing_studio_tpu.serving import RenderJob, RenderService

    rate = args.rate
    n = int(args.seconds * rate)
    t = np.arange(n) / rate
    rng = np.random.default_rng(0)
    clips = [
        (0.4 * np.sin(2 * np.pi * (180 + 20 * i) * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
        for i in range(args.jobs)
    ]
    # a value sweep across the burst — all jobs share one static signature
    params = [
        RenderParams(
            target_layout="Stereo",
            diffusion=0.2 + 0.6 * (i / max(1, args.jobs - 1)),
            x_pos=0.1 + 0.8 * (i / max(1, args.jobs)),
        )
        for i in range(args.jobs)
    ]

    svc = RenderService(
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        fast_filters=args.fast_filters,
        pcm16_output=True,
    )

    def burst(tag: str) -> float:
        t0 = time.perf_counter()
        futs = [
            svc.submit(
                RenderJob(c, rate, p, seed=i, with_metrics=args.metrics)
            )
            for i, (c, p) in enumerate(zip(clips, params))
        ]
        results = [f.result() for f in futs]
        dt = time.perf_counter() - t0
        # results are int16 (pcm16_output) so NaNs were clipped on device;
        # the honest sanity check is true-span length + audible signal
        for i, r in enumerate(results):
            assert r.audio.shape[0] > n, f"job {i}: no reverb tail"
            assert np.abs(np.asarray(r.audio, np.float32)).max() > 0, f"job {i} silent"
        print(f"{tag}: {dt:.3f} s for {args.jobs} jobs", file=sys.stderr)
        return dt

    burst("warmup (compile)")
    dt = burst("measured")

    audio_seconds = args.jobs * args.seconds
    stats = svc.stats()
    svc.stop()
    out = {
        "metric": "serving realtime factor (audio-sec/sec, end-to-end jobs)",
        "value": round(audio_seconds / dt, 1),
        "unit": "x realtime",
        "jobs": args.jobs,
        "job_latency_s": round(dt, 3),
        "batch_sizes": stats["batch_sizes"][-8:],
        "backend": backend,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
