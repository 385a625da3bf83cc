"""Runtime/backend bootstrapping shared by CLI and app entry points."""

from __future__ import annotations

import logging

log = logging.getLogger("ars_tpu.runtime")


_PROBE_RESULT: bool | None = None  # out-of-process TPU probe, once per process


def _tpu_plugin_responds(timeout_s: float) -> bool:
    """Bounded out-of-process TPU-plugin probe.

    The TPU plugin's init HANGS forever (no exception — an hrtimer retry
    loop) when the device tunnel is down, so it must never be allowed to
    grab THIS process first.  The probe inherits cwd/env, so it exercises
    the same registration path the caller would.
    """
    global _PROBE_RESULT
    if _PROBE_RESULT is not None:
        return _PROBE_RESULT
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        _PROBE_RESULT = proc.returncode == 0
    except subprocess.TimeoutExpired:
        log.warning(
            "TPU backend init did not respond within %.0fs (device tunnel "
            "down?); forcing CPU", timeout_s,
        )
        _PROBE_RESULT = False
    return _PROBE_RESULT


def ensure_backend() -> str:
    """Initialize a usable JAX backend, falling back to CPU.

    Some images pin JAX_PLATFORMS to an experimental TPU plugin that only
    registers under specific conditions; a CLI invoked elsewhere would die at
    first device use.  Try the configured backend, then fall back.

    The axon TPU plugin ignores the JAX_PLATFORMS *environment variable*
    (only ``jax.config.update("jax_platforms", ...)`` before backend init
    takes effect) — so a subprocess launched with JAX_PLATFORMS=cpu would
    still initialize the TPU plugin, and when the device tunnel is degraded
    that init can hang in retry sleeps for minutes.  Honor the env var
    through the config path first.

    When the effective platform may be the TPU plugin, a bounded
    out-of-process probe (ARS_TPU_PROBE_TIMEOUT, default 120 s) runs first:
    plugin init HANGS forever when the device tunnel is down, which would
    otherwise freeze every CLI/app entry point with no error.
    """
    import os

    import jax

    env_pf = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if env_pf:
        try:
            jax.config.update("jax_platforms", env_pf)
        except Exception:  # already initialized: keep the active backend
            pass
    try:
        cfg_pf = (jax.config.jax_platforms or "").strip().lower()
    except Exception:
        cfg_pf = ""
    effective = env_pf or cfg_pf  # "" = plugin default (may be TPU)
    explicit_cpu = effective == "cpu"
    if not explicit_cpu:
        timeout_s = float(os.environ.get("ARS_TPU_PROBE_TIMEOUT", "120"))
        if not _tpu_plugin_responds(timeout_s):
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
    try:
        jax.devices()
        return jax.default_backend()
    except RuntimeError as e:
        log.warning("configured JAX backend unavailable (%s); falling back", e)
    # an explicitly requested CPU backend must never fall back into the
    # (possibly hanging) TPU plugin init
    fallbacks = ("cpu",) if explicit_cpu else ("tpu", "cpu")
    for platform in fallbacks:
        try:
            jax.config.update("jax_platforms", platform)
            jax.devices()
            return jax.default_backend()
        except RuntimeError:
            continue
    raise RuntimeError("no usable JAX backend (tried configured, tpu, cpu)")


def enable_nan_checks() -> None:
    """Numeric sanitizer (SURVEY §5.2): raise on NaN escaping any jitted op.

    The functional model removes data races; NaN propagation is the remaining
    numeric hazard (the reference scrubs with np.nan_to_num at the very end,
    raytracer_studio.py:1083 — we keep that scrub AND offer eager detection).
    """
    import jax

    jax.config.update("jax_debug_nans", True)
