"""Runtime/backend bootstrapping shared by CLI and app entry points."""

from __future__ import annotations

import logging

log = logging.getLogger("ars_tpu.runtime")


def ensure_backend() -> str:
    """Initialize a usable JAX backend, falling back to CPU.

    Some images pin JAX_PLATFORMS to an experimental TPU plugin that only
    registers under specific conditions; a CLI invoked elsewhere would die at
    first device use.  Try the configured backend, then fall back.
    """
    import jax

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
