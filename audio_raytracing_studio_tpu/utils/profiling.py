"""Tracing / profiling harness (SURVEY §5.1).

The reference's only instrumentation is print() narration; this module is
the framework-grade replacement: named trace annotations that show up in the
XLA/TPU profiler, a block-until-ready timing harness for steady-state
throughput numbers, and a programmatic profiler-session helper.
"""

from __future__ import annotations

import contextlib
import dataclasses
import statistics
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Named region for the JAX/TPU profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profiler_session(log_dir: str) -> Iterator[None]:
    """Capture a full device trace into ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class TimingResult:
    name: str
    iterations: int
    seconds_per_call: float
    seconds_median: float
    seconds_min: float

    def realtime_factor(self, audio_seconds: float) -> float:
        return audio_seconds / self.seconds_per_call

    def __str__(self) -> str:
        return (
            f"{self.name}: {self.seconds_per_call * 1e3:.2f} ms/call "
            f"(median {self.seconds_median * 1e3:.2f}, min {self.seconds_min * 1e3:.2f}, "
            f"n={self.iterations})"
        )


def _force_sync(out) -> None:
    """Force device completion via a scalar readback of the first numeric
    leaf — float OR integer (the device-side PCM16 path returns int16, and
    block_until_ready lies on axon for donated-arg jits) — falling back to
    block_until_ready only for pytrees with no numeric leaves at all."""
    import jax.numpy as jnp
    import numpy as np

    synced = False
    for leaf in jax.tree_util.tree_leaves(out):
        dt = getattr(leaf, "dtype", None)
        # complex leaves are excluded: eager complex arithmetic (the sum)
        # is itself UNIMPLEMENTED on axon
        if dt is not None and (
            np.issubdtype(dt, np.floating) or np.issubdtype(dt, np.integer)
        ):
            # EVERY numeric leaf: a host composition of several jitted
            # calls yields leaves from independent executables, and syncing
            # only the first would stop the clock while later dispatches
            # are still running
            float(jnp.sum(leaf))
            synced = True
    if not synced:
        jax.block_until_ready(out)


def time_jitted(
    fn: Callable,
    *args,
    name: str = "fn",
    iterations: int = 5,
    warmup: int = 1,
    **kwargs,
) -> TimingResult:
    """Steady-state timing of a device computation.

    Compiles/warms up first, then measures wall time per call, forcing
    completion with a scalar readback of the result: on the axon backend
    ``block_until_ready`` alone can return ~0.3 ms for ~0.2 s of device
    work when the jit carries donated args (CLAUDE.md) — the readback is
    the honest sync, same methodology as bench.py.
    """
    for _ in range(max(1, warmup)):
        _force_sync(fn(*args, **kwargs))
    samples = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        _force_sync(fn(*args, **kwargs))
        samples.append(time.perf_counter() - t0)
    return TimingResult(
        name=name,
        iterations=iterations,
        seconds_per_call=sum(samples) / len(samples),
        seconds_median=statistics.median(samples),
        seconds_min=min(samples),
    )


def cpu_test_cache_dir() -> str:
    """The CPU-suite executable cache — ONE definition shared by
    tests/conftest.py and the two-process dryrun workers, so the dryrun
    never silently stops sharing the suite's warm cache."""
    import os

    return os.path.join(os.path.expanduser("~"), ".cache", "ars_tpu_xla_cputests")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled XLA executables across processes (SURVEY §5.4).

    Makes "resume" include warm compile state: a rerun of the same render
    configuration skips the 10–40 s first-compile cost.
    """
    import os

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "ars_tpu_xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
