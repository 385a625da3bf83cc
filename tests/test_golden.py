"""Golden regression pins: the oracle's PCM16 output is frozen.

Parity tests pin the JAX pipeline to the oracle; these hashes pin the oracle
itself (and with it the whole semantic chain) against accidental drift.  If
one fails, a semantics-bearing constant or formula changed — that is either
a bug or a deliberate contract change that must be called out in PARITY.md.
"""

import hashlib

import numpy as np

from audio_raytracing_studio_tpu.oracle import dsp
from audio_raytracing_studio_tpu.params import (
    IRDraws,
    RenderParams,
    adjust_parameters_for_3d,
    compute_final_directionality_3d,
    derive_ir_geometry,
)

GOLDEN = {
    "Stereo": "6df11506ac6c195b8567c0a97932f2214e042bf3e98a8a24c294b00f25878ec7",
    "5.1 (Standard)": "b597b220a8b1b221cb6fcab6aa809e49e4c3bd3804a25342824c7cc756db21b2",
}


def test_oracle_pcm16_is_frozen():
    rate = 16000
    t = np.arange(rate // 2) / rate
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for layout, expected in GOLDEN.items():
        p = RenderParams(target_layout=layout, room_size=60.0)
        dur, refs, maxd, split = adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)
        dirc = compute_final_directionality_3d(
            p.x_pos, p.y_pos, p.z_pos, p.hall_type, p.diffusion, p.dry_wet
        )
        g = derive_ir_geometry(rate, dur, refs, maxd, p.material, dirc, split, p.diffusion)
        d = IRDraws.sample(np.random.default_rng(42), g)
        q = dsp.quantize_pcm16(dsp.render(x, rate, p, draws=d))
        assert hashlib.sha256(q.tobytes()).hexdigest() == expected, layout
