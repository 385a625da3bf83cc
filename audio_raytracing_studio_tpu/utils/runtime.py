"""Runtime/backend bootstrapping shared by CLI and app entry points."""

from __future__ import annotations

import logging

log = logging.getLogger("ars_tpu.runtime")


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
        jax.devices()
        return jax.default_backend()
    except RuntimeError as e:
        log.warning("configured JAX backend unavailable (%s); falling back", e)
    for platform in ("tpu", "cpu"):
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
