"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip sharding paths (mesh/pjit/shard_map) are exercised on a virtual
8-device CPU mesh; TPU hardware is only used by bench.py.  Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; only
# the config API reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persist compiled executables across suite runs (the distributed-EQ and
# two-process dryrun compiles dominate the ~13-min wall; a warm cache cuts
# them to disk reads).  Same mechanism the product uses (utils.profiling.
# enable_compilation_cache), separate directory so TPU executables from
# bench runs never mix with the 8-device CPU ones.
from audio_raytracing_studio_tpu.utils.profiling import (
    cpu_test_cache_dir,
    enable_compilation_cache,
)

enable_compilation_cache(cpu_test_cache_dir())

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xA0D10)


@pytest.fixture
def tone48k(rng):
    """1.2 s, 48 kHz mono test tone with transient + noise content."""
    rate = 48000
    t = np.arange(int(1.2 * rate)) / rate
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 3150.0 * t)
        + 0.05 * rng.standard_normal(t.shape)
    )
    x[: rate // 100] = 0.0
    x[rate // 2] = 0.9  # click transient
    return x.astype(np.float32), rate
