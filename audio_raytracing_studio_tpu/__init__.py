"""Audio Raytracing Studio — TPU-native rebuild.

A JAX/XLA/Pallas reimplementation of CipherCorePro/Audio-Raytracing-Studio:
procedural impulse-response synthesis ("audio raytracing"), FFT convolution
reverb, 3D surround panning, channel-layout mapping, BS.1770 loudness
metering, v4 JSON presets, and the same 4-tab web UI — rebuilt TPU-first
(batched static-shape graphs, device meshes, Pallas kernels) rather than
translated.

Reference behavior citations throughout point into
/root/reference/raytracer_studio.py (studied, not copied).
"""

from . import config
from .params import IRDraws, IRGeometry, RenderParams

__version__ = "0.1.0"

__all__ = [
    "config",
    "RenderParams",
    "IRGeometry",
    "IRDraws",
    "__version__",
]
