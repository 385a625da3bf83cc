"""A/B: does a forced sync between streaming pass 1 and the exact EQ help?

BENCH_HISTORY (round 3) recorded 13.4-13.9 s for the 30-min exact-EQ
streaming render when the EQ's transforms are enqueued back-to-back with
pass 1, but 10.4 s when a sync barrier sat between them — an anomaly worth
settling by measurement before shipping either way (host dispatch of the
m = 2^28 four-step graphs appears to contend with pass 1's execution).

Runs the compute-only protocol (return_output=False, metrics force the
render; idle host required — see CLAUDE.md) twice per arm on a warm cache
and prints one JSON line per arm.  If the barrier reliably wins, ship it in
parallel/streaming.py; if not, record the refutation in BENCH_HISTORY.

Usage: python tools/measure_eq_barrier.py [--minutes 30] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)  # the axon plugin only registers from certain directories


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from audio_raytracing_studio_tpu.utils.profiling import enable_compilation_cache
    from audio_raytracing_studio_tpu.utils.runtime import ensure_backend

    enable_compilation_cache()
    backend = ensure_backend()
    print(json.dumps({"backend": backend}), flush=True)
    if backend != "tpu":
        print(json.dumps({"ok": False, "error": "needs the real TPU"}))
        return 1

    import jax.numpy as jnp
    import numpy as np

    from audio_raytracing_studio_tpu.parallel import streaming_eq
    from audio_raytracing_studio_tpu.parallel.streaming import render_streaming
    from audio_raytracing_studio_tpu.params import RenderParams
    from tools.bench_long import _make_long_clip

    rate = 48000
    seconds = args.minutes * 60.0
    x = _make_long_clip(args.minutes, rate)
    p = RenderParams(target_layout="5.1 (Standard)", room_size=200.0,
                     bass_gain=1.6, treble_gain=0.7)

    def render():
        _none, metrics = render_streaming(
            x, rate, p, seed=1, chunk_seconds=30.0,
            with_metrics=True, return_output=False,
        )
        return metrics

    orig = streaming_eq.shelf_eq_streaming

    def with_barrier(buf, n0, r, bg, tg, d_rows=streaming_eq.DEFAULT_D_ROWS, **kw):
        # scalar readback forces pass 1's producer chain to complete before
        # the EQ graphs are traced/dispatched (block_until_ready lies on
        # axon — CLAUDE.md).  **kw passes the round-3 ``dynamic`` knob
        # through — without it this arm TypeErrors under streaming.py's
        # call signature.
        float(jnp.max(jnp.abs(buf[:, :8])))
        return orig(buf, n0, r, bg, tg, d_rows, **kw)

    # warm both arms' executables (identical device graphs; the barrier is
    # host-side only) — TWICE, so any residual first-run cost (persistent-
    # cache population, allocator warmup) cannot land in the first timed
    # arm and bias the A/B verdict
    render()
    render()

    results = {}
    for arm, fn in (("no_barrier", orig), ("barrier", with_barrier)):
        streaming_eq.shelf_eq_streaming = fn
        # also rebind the name imported into streaming.py? it imports inside
        # the function body from .streaming_eq, so module-attr patching holds
        walls = []
        metrics = None
        for _ in range(args.iters):
            t0 = time.perf_counter()
            metrics = render()
            walls.append(time.perf_counter() - t0)
        results[arm] = walls
        print(json.dumps({
            "arm": arm,
            "walls_s": [round(w, 2) for w in walls],
            "best_realtime": round(seconds / min(walls), 1),
            "metrics": {k: round(v, 2) for k, v in metrics.items()},
        }), flush=True)
    streaming_eq.shelf_eq_streaming = orig

    best_nb, best_b = min(results["no_barrier"]), min(results["barrier"])
    print(json.dumps({
        "verdict": "barrier_wins" if best_b < best_nb * 0.95 else (
            "no_barrier_wins" if best_nb < best_b * 0.95 else "tie"),
        "no_barrier_best_s": round(best_nb, 2),
        "barrier_best_s": round(best_b, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
