"""Headline benchmark: batched realtime factor on one TPU chip.

BASELINE.json metric: "Realtime factor (audio-sec rendered/sec/chip), 60 s
48 kHz clip, IR synth + convolve" — rendered through the full internal-hall
graph (BASELINE config 1: Room hall, default material, mono → stereo,
including the air-absorption filter and all normalizations) batched over B
clips in one SPMD program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_exact", "vs_baseline_exact"} — "value" is the fast filter mode
(≤~2e-4 deviation, inside the 1e-3 parity contract), "value_exact" the
bit-honest exact-length filter path (the reference's semantics), both
measured in one process on the warm cache.  vs_baseline is the ratio
against the measured CPU oracle realtime factor (BASELINE_CPU.json — the
reference-equivalent NumPy/SciPy pipeline on this machine; the reference
itself publishes no numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DURATION_S = 60.0
RATE = 48000


def _cpu_baseline_rtf() -> float:
    path = os.path.join(REPO, "BASELINE_CPU.json")
    try:
        with open(path) as f:
            return float(json.load(f)["realtime_factor"])
    except Exception:
        return 8.53  # measured 2026-08-16 on this image (tools/measure_cpu_baseline.py)


def _probe_tpu(timeout_s: float) -> str | None:
    """Bounded TPU-availability probe in a subprocess.

    The axon plugin's init HANGS forever (not errors) when the TPU tunnel is
    down (observed 2026-08-17), and it only registers from certain working
    directories — so probe out-of-process, from the repo root, with a hard
    timeout. Returns None if the backend came up, else a short reason string.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-u", "-c", "import jax; jax.devices()"],
            cwd=REPO,
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend init hung >{timeout_s:.0f}s (TPU tunnel down?)"
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        return f"backend init failed: {tail[-1] if tail else 'unknown error'}"
    return None


def _error_line(reason: str) -> None:
    print(
        json.dumps(
            {
                "metric": "realtime_factor_60s48k_batched_per_chip",
                "value": 0.0,
                "unit": "audio_seconds_per_second",
                "vs_baseline": 0.0,
                "error": reason,
                # environment failure, not a framework number: the last
                # value actually measured on chip (BENCH_HISTORY.md round 3,
                # 2026-08-17, pre-outage) so a 0.0 record stays attributable
                "last_measured_on_tpu": {
                    "value": 5735.0,
                    "vs_baseline": 672.3,
                    "date": "2026-08-17",
                },
            }
        )
    )


def main() -> None:
    # The axon plugin only registers from certain working directories
    # (CLAUDE.md) — the probe subprocess already runs from REPO; the main
    # process must too, or it silently falls back to CPU and the headline
    # number measures the wrong backend.
    os.chdir(REPO)

    # Never hang the driver: if the TPU backend can't come up within the
    # bound, still print the one contract JSON line (value 0 + error note).
    want_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    if not want_cpu:
        reason = _probe_tpu(float(os.environ.get("BENCH_PROBE_TIMEOUT", "180")))
        if reason is not None:
            _error_line(reason)
            return

    import jax

    if want_cpu:
        # the axon plugin ignores the JAX_PLATFORMS env var — only the
        # config path forces CPU before backend init (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    try:  # warm-restart: persist compiled executables across bench runs
        from audio_raytracing_studio_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)
    if not want_cpu and backend != "tpu":
        # the probe said the plugin responds, yet this process came up on
        # CPU (wrong cwd / registration failure): a CPU number labelled as
        # the per-chip headline would be worse than no number
        _error_line(f"expected TPU backend, got {backend!r}")
        return

    from audio_raytracing_studio_tpu.models import pipeline
    from audio_raytracing_studio_tpu.parallel import sharding
    from audio_raytracing_studio_tpu.params import RenderParams

    batch = int(os.environ.get("BENCH_BATCH", "48"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    t = np.arange(int(DURATION_S * RATE)) / RATE
    # varied content per clip (distinct tones + deterministic noise):
    # throughput here is content-independent, but the headline shouldn't
    # rest on 48 copies of one sine.
    rng = np.random.default_rng(0xBE7C)
    clips = np.stack(
        [
            (
                0.3 * np.sin(2 * np.pi * (180.0 + 9.0 * i) * t)
                + 0.05 * np.sin(2 * np.pi * (1000.0 + 37.0 * i) * t)
            ).astype(np.float32)
            + (0.02 * rng.standard_normal(t.shape)).astype(np.float32)
            for i in range(batch)
        ]
    )
    p = RenderParams(target_layout="Stereo")

    # Build the batched program pieces once (host setup + device inputs).
    clips_cn = np.stack([pipeline._ensure_stereo_host(c).T for c in clips])
    import jax.numpy as jnp

    audio_bcn = jnp.asarray(clips_cn)
    keys = jnp.arange(batch, dtype=jnp.int32)  # counter-based seeds (ops.rng)

    def measure(fast: bool) -> float:
        """Warm up + time one filter mode → realtime factor."""
        setup = pipeline.build_internal_setup(
            p, RATE, clips.shape[1], fast_filters=fast
        )
        ir_scalars = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,)), setup.ir_scalars
        )
        mix_scalars = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,)), setup.mix_scalars
        )

        def run():
            out, _ = sharding._batched_internal(
                audio_bcn,
                keys,
                ir_scalars,
                mix_scalars,
                ir_shape=setup.ir_shape,
                spec=setup.spec,
                with_metrics=False,
            )
            # block_until_ready does NOT block under the axon tunnel
            # (measured: returns in ~0.3 ms for work that takes ~0.2 s) —
            # force a real device sync with a scalar readback of the output.
            return float(jnp.sum(out))

        run()  # compile + warmup
        # Settle before opening the timed window: in a cold-cache process
        # the first executions after a big compile still contend with
        # executable serialization / program paging through the tunnel on
        # this 1-core host — measured depressing the steady-state number
        # 13× (446 vs 5778 on identical code, round-5 session 4).  Run
        # until two consecutive samples agree within 20%, bounded by
        # BENCH_SETTLE_MAX; on a warm cache this costs two fast calls.
        settle: list[float] = []
        for _ in range(int(os.environ.get("BENCH_SETTLE_MAX", "12"))):
            t0 = time.perf_counter()
            run()
            settle.append(time.perf_counter() - t0)
            if len(settle) >= 2 and abs(settle[-1] - settle[-2]) <= 0.2 * min(
                settle[-2:]
            ):
                break
        if len(settle) > 2:
            print(
                f"settle({'fast' if fast else 'exact'}): "
                f"{[round(s, 3) for s in settle]}",
                file=sys.stderr,
            )
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        wall = samples[len(samples) // 2]  # median: robust to one straggler
        return batch * DURATION_S / wall

    # BOTH modes in one process on the warm cache (round-4 VERDICT item 2):
    # "value" is the fast mode (conv-grid air + fused wet spectrum, ≤~2e-4
    # deviation — parity-tested vs the oracle, inside the 1e-3 contract);
    # "value_exact" is the bit-honest exact-length filter path — the
    # reference's own semantics (raytracer_studio.py:310-336, 387-398) —
    # carried in the SAME driver-recorded line so it cannot silently
    # regress.  BENCH_FAST=0 skips the fast arm (exact becomes the
    # headline), BENCH_EXACT=0 skips the exact arm — iteration knobs only;
    # the driver runs both.
    baseline = _cpu_baseline_rtf()
    record = {
        "metric": "realtime_factor_60s48k_batched_per_chip",
        "value": 0.0,
        "unit": "audio_seconds_per_second",
        "vs_baseline": 0.0,
    }
    if os.environ.get("BENCH_FAST", "1") == "1":
        rtf = measure(fast=True)
        record["value"] = round(rtf, 2)
        record["vs_baseline"] = round(rtf / baseline, 2)
    if os.environ.get("BENCH_EXACT", "1") == "1":
        rtf_exact = measure(fast=False)
        record["value_exact"] = round(rtf_exact, 2)
        record["vs_baseline_exact"] = round(rtf_exact / baseline, 2)
        if record["value"] == 0.0:  # fast arm skipped: exact IS the headline
            record["value"] = record["value_exact"]
            record["vs_baseline"] = record["vs_baseline_exact"]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
