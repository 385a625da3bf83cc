"""Directory batch renderer — production serving loop with I/O prefetch.

Renders every WAV in a directory through the batched SPMD pipeline, keeping
the TPU busy: a background thread reads + stereo-izes the next micro-batch
(and writes finished ones) while the device renders the current one.  Clips
are bucketed by (length, rate) so each bucket reuses one compiled executable;
within a bucket, shorter clips are zero-padded to the bucket length.

Usage:
  python -m audio_raytracing_studio_tpu.cli.render_dir in_dir/ out_dir/ \
      --hall Cathedral --room-size 400 --layout "5.1 (Standard)" \
      --batch 8 --seed 7 --metrics
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import math
import os
import sys
import time
from typing import List

import numpy as np

from .. import config
from ..analysis.metrics import metrics_string
from ..params import RenderParams
from ..utils import wavio
from .render import params_from_args


def _bucket_length(n: int) -> int:
    """Quantize clip length up to a half-second grid to bound compile count."""
    step = 24000
    return int(math.ceil(n / step)) * step


def discover(in_dir: str) -> List[str]:
    return sorted(
        f for f in os.listdir(in_dir) if f.lower().endswith(".wav")
    )


def main(argv=None) -> int:
    from .render import add_param_flags

    ap = argparse.ArgumentParser(
        prog="ars-render-dir", description="directory batch renderer"
    )
    ap.add_argument("input", help="input directory of WAV files")
    ap.add_argument("output", help="output directory")
    ap.add_argument("--batch", type=int, default=8, help="micro-batch size")
    add_param_flags(ap)
    args = ap.parse_args(argv)

    from ..utils.runtime import ensure_backend

    ensure_backend()
    from ..parallel.sharding import render_batch

    os.makedirs(args.output, exist_ok=True)
    names = discover(args.input)
    if not names:
        print("no WAV files found", file=sys.stderr)
        return 1
    p = params_from_args(args)
    if p.use_external_ir:
        print("error: render_dir covers the internal hall path", file=sys.stderr)
        return 2

    # --- bucket by (rate, padded length) ---
    def load(name):
        try:
            data, rate = wavio.read(os.path.join(args.input, name))
        except (OSError, ValueError) as e:
            print(f"skipping {name}: {e}", file=sys.stderr)
            return None
        return name, data, rate

    io_pool = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    loaded = [r for r in io_pool.map(load, names) if r is not None]
    if not loaded:
        print("no readable WAV files", file=sys.stderr)
        return 1
    buckets: dict = {}
    for name, data, rate in loaded:
        key = (rate, _bucket_length(data.shape[0]))
        buckets.setdefault(key, []).append((name, data))

    results = []
    t_start = time.perf_counter()
    audio_seconds = 0.0
    write_futures = []

    for (rate, n_bucket), items in sorted(buckets.items()):
        for lo in range(0, len(items), args.batch):
            chunk = items[lo : lo + args.batch]
            clips = np.zeros((len(chunk), n_bucket, 2), dtype=np.float32)
            for i, (_, data) in enumerate(chunk):
                stereo = data if data.shape[1] >= 2 else np.repeat(data, 2, axis=1)
                clips[i, : data.shape[0], :] = stereo[:, :2]
            outs, metrics = render_batch(
                clips, rate, p,
                seeds=[args.seed + lo + i for i in range(len(chunk))],
                with_metrics=True, fast_filters=True,
            )
            for i, (name, data) in enumerate(chunk):
                out_path = os.path.join(args.output, name)
                # trim the bucket padding: real output = clip len + IR − 1
                real_len = data.shape[0] + (outs.shape[1] - n_bucket)
                trimmed = np.clip(
                    outs[i, :real_len], -config.OUTPUT_CLIP, config.OUTPUT_CLIP
                )
                write_futures.append(
                    io_pool.submit(wavio.write, out_path, trimmed, rate)
                )
                audio_seconds += data.shape[0] / rate
                results.append({"output": out_path, "metrics": metrics[i]})

    for f in write_futures:
        f.result()
    wall = time.perf_counter() - t_start
    io_pool.shutdown()

    if args.json:
        print(json.dumps({"clips": results, "audio_seconds": audio_seconds,
                          "wall_seconds": wall,
                          "realtime_factor": audio_seconds / wall if wall else None}))
    else:
        for r in results:
            line = r["output"]
            if args.metrics:
                line += "  " + metrics_string(r["metrics"])
            print(line)
        print(f"# {len(results)} clips, {audio_seconds:.1f} audio-s in {wall:.2f} s "
              f"({audio_seconds / wall:.1f}x realtime)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
