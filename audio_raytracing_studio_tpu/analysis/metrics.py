"""User-facing metrics: the reference's exact metrics-string contract.

Format defined at /root/reference/raytracer_studio.py:1070-1075:
``"LUFS: {x:.2f} | Peak: {y:.1f} dBFS | RMS: {z:.1f} dBFS"`` with "N/A" for
missing LUFS and "-inf" for silent peak/RMS.
"""

from __future__ import annotations

import math
import numpy as np


def metrics_string(metrics: dict) -> str:
    """Render the metrics dict exactly like the reference UI string."""
    lufs = metrics.get("lufs")
    peak = metrics.get("true_peak_dbfs")
    rms = metrics.get("rms_dbfs")

    lufs_str = (
        f"{float(lufs):.2f}"
        if lufs is not None and not math.isinf(float(lufs))
        else "N/A"
    )
    peak_str = (
        f"{float(peak):.1f}"
        if peak is not None and not math.isinf(float(peak))
        else "-inf"
    )
    rms_str = (
        f"{float(rms):.1f}" if rms is not None and not math.isinf(float(rms)) else "-inf"
    )
    return f"LUFS: {lufs_str} | Peak: {peak_str} dBFS | RMS: {rms_str} dBFS"


def calculate_audio_metrics(data: np.ndarray, rate: int, backend: str = "jax") -> dict:
    """LUFS / sample-peak / RMS of (samples, channels) audio.

    backend="jax" runs the on-device meter (metering.loudness);
    backend="oracle" runs the float64 NumPy meter (oracle.loudness).
    """
    if backend == "oracle":
        from ..oracle.loudness import calculate_audio_metrics as oracle_metrics

        return oracle_metrics(data, rate)

    import jax.numpy as jnp

    from ..metering import loudness

    x = np.asarray(data, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, np.newaxis]
    # >2-D input: the reference warns and returns the None-metrics dict
    # (raytracer_studio.py:674-711 error path) — never raises
    if x.ndim != 2 or x.size == 0 or rate <= 0:
        return {"lufs": None, "true_peak_dbfs": None, "rms_dbfs": None}
    m = loudness.audio_metrics(jnp.asarray(x.T), int(rate))
    return {k: float(v) for k, v in m.items()}
