"""Fused RIR-bank synthesis as a Pallas TPU kernel.

The north star names this component explicitly: "the procedural RIR generator
… becomes a fused Pallas kernel that synthesizes banks of impulse responses
in parallel".  One kernel program per bank entry generates, entirely in
VMEM with the on-core PRNG (no HBM round trips, no host randomness):

  early: random taps → masked accumulation over the tap budget,
  late:  uniform noise → static-width moving average → exponential decay
         envelope → amplitude shaping,
  both:  peak normalization (0.9 / 0.7, reference raytracer_studio.py:299-303).

Layout: an IR of length L lives as an (8, L/8) float32 VMEM tile in
*column-major* sample order (sample p at row p%8, column p//8) — the natural
sublane packing, so a 10 s 48 kHz IR costs 1.9 MB of VMEM, and flat sample
shifts decompose into two rolls + a select (``_flat_shift``).

Randomness contract: the bank uses the TPU core PRNG seeded per entry —
deterministic for a given (seed, shape) but a *different* stream than
jax.random; oracle-parity tests therefore run against the injected-draws
path (ops.ir_synth), while this kernel is the production fast path whose
outputs are validated structurally/distributionally (plus: the CPU Pallas
interpreter ignores prng_seed values, so seed-sensitivity is asserted on
real TPU only).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from .ir_synth import MAX_REFLECTIONS, IRScalars, IRShape

LANE = 128
SUBLANE = 8
TILE_FLAT = SUBLANE * LANE  # 1024

# Longest IR the single-program-per-entry design compiles for on v5e: the
# whole IR plus the smoothing/envelope temporaries must fit VMEM.  Measured
# ceiling ~280k samples (5.8 s @ 48 kHz); 2^18 leaves margin.  Longer IRs
# need the column-block grid redesign (ROADMAP) — callers fall back to the
# jnp synthesis path.
MAX_BANK_IR_LENGTH = 1 << 18


def _pad_to_tile(n: int) -> int:
    return ((n + TILE_FLAT - 1) // TILE_FLAT) * TILE_FLAT


def _uniform_from_bits(bits: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """uint32 bits → uniform [lo, hi) float32 via the mantissa trick."""
    mantissa = jax.lax.shift_right_logical(bits, np.uint32(9))
    one_to_two = pltpu.bitcast(mantissa | np.uint32(0x3F800000), jnp.float32)
    return lo + (one_to_two - 1.0) * (hi - lo)


def _flat_shift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Circularly shift an (8, C) column-major tile by ``s`` flat samples.

    Sample p sits at (p % 8, p // 8); a flat shift of s = 8q + r decomposes
    into a column roll by q plus a row roll by r with a one-column carry for
    the rows that wrapped.  Wrap-around is circular over the padded tile —
    callers mask the (few) contaminated boundary samples.
    """
    rows, cols = x.shape[-2], x.shape[-1]
    q, r = divmod(s, rows)  # python divmod: 0 <= r < 8 also for negative s
    y = pltpu.roll(x, shift=q % cols, axis=1)
    if r == 0:
        return y
    a = pltpu.roll(y, shift=r, axis=0)
    b = pltpu.roll(a, shift=1, axis=1)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    return jnp.where(row_id >= r, a, b)


def _rir_bank_kernel(
    seed_ref,  # SMEM (B, 1) int32 — per-entry seeds (full array)
    scal_ref,  # SMEM (B, 4) f32 — 1−absorption, directionality, log_decay, initial_amp
    *refs,  # [delays, strengths, noise refs when injected] + [early_out, late_out]
    shape: IRShape,
    cols: int,
    injected: bool,
):
    b = pl.program_id(0)
    if injected:
        # Explicit draws (testing/parity): same contract as ops.ir_synth's
        # injected-draws path; lets the CPU Pallas interpreter — whose PRNG
        # emulation returns constant bits — validate the full kernel math.
        delays_ref, strengths_ref, noise_ref, early_ref, late_ref = refs
    else:
        early_ref, late_ref = refs
        pltpu.prng_seed(seed_ref[b, 0])

    one_minus_absorption = scal_ref[b, 0]
    directionality = scal_ref[b, 1]
    log_decay = scal_ref[b, 2]
    initial_amp = scal_ref[b, 3]

    row_id = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, cols), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, cols), 1)
    pos = col_id * SUBLANE + row_id  # flat sample index, column-major

    # --- early taps (ref :258-268) ---
    early = jnp.zeros((SUBLANE, cols), dtype=jnp.float32)
    if shape.early_taps_active:
        hi = max(2, shape.actual_max_early_delay)
        if injected:
            delays = delays_ref[0, :, :][0:1]
            strengths = strengths_ref[0, :, :][0:1]
        else:
            # (8, 128) lane-aligned bit block; row 0 → delays, row 1 → strengths
            tap_bits = pltpu.bitcast(
                pltpu.prng_random_bits((SUBLANE, LANE)), jnp.uint32
            )
            delays = 1 + (tap_bits[0:1] % np.uint32(max(1, hi - 1))).astype(jnp.int32)
            strengths = _uniform_from_bits(tap_bits[1:2], *config.EARLY_STRENGTH_RANGE)
        falloff = 1.0 - (
            delays.astype(jnp.float32) / float(shape.actual_max_early_delay)
        ) ** config.EARLY_DELAY_DECAY_EXP
        amps = (
            strengths
            * one_minus_absorption
            * jnp.clip(directionality, 0.1, 1.0)
            * falloff
        )
        for k in range(min(MAX_REFLECTIONS, shape.reflection_count)):
            d_k = delays[0, k]
            valid = jnp.logical_and(d_k > 0, d_k < shape.split_point)
            amp_k = jnp.where(valid, amps[0, k], 0.0)
            early = early + jnp.where(pos == d_k, amp_k, 0.0)

    # --- late tail (ref :270-296) ---
    late = jnp.zeros((SUBLANE, cols), dtype=jnp.float32)
    if shape.late_length > 0:
        if injected:
            noise = noise_ref[0, :, :]
        else:
            noise_bits = pltpu.bitcast(
                pltpu.prng_random_bits((SUBLANE, cols)), jnp.uint32
            )
            noise = _uniform_from_bits(noise_bits, -1.0, 1.0)
        # Zero noise outside [0, late_length): gives the reference's
        # zero-padded 'same' smoothing at BOTH tail edges (the roll-based
        # flat shifts would otherwise wrap unrelated PRNG samples in).
        noise = jnp.where(pos < shape.late_length, noise, 0.0)

        w = shape.noise_smooth_width
        if w > 1 and shape.late_length >= w:
            lead = w // 2
            acc = jnp.zeros_like(noise)
            for k in range(w):
                # np.convolve 'same': tap k reads noise[p + k - lead]
                acc = acc + _flat_shift(noise, lead - k)
            smoothed = acc / float(w)
            # variance re-scale over the tail window (ref :289-290)
            n_f = float(shape.late_length)
            in_range = (pos < shape.late_length).astype(jnp.float32)

            def _std(x):
                m = jnp.sum(x * in_range) / n_f
                var = jnp.sum(jnp.square((x - m)) * in_range) / n_f
                return jnp.sqrt(var)

            std_raw = _std(noise)
            std_smooth = _std(smoothed)
            smoothed = jnp.where(
                std_smooth > 1e-6, smoothed / std_smooth * std_raw, noise
            )
        else:
            smoothed = noise

        envelope = jnp.exp(pos.astype(jnp.float32) * log_decay)
        tail = smoothed * initial_amp * envelope
        shifted = _flat_shift(tail, shape.split_point)
        tail_mask = jnp.logical_and(
            pos >= shape.split_point, pos < shape.split_point + shape.late_length
        )
        late = jnp.where(tail_mask, shifted, 0.0)

    # --- normalization (ref :299-303); pos==0 is silent by construction ---
    length_mask = pos < shape.length
    early = jnp.where(length_mask, early, 0.0)
    early_max = jnp.max(jnp.abs(early))
    early = early * jnp.where(early_max > 1e-6, config.EARLY_NORM_PEAK / early_max, 1.0)
    late_max = jnp.max(jnp.abs(late))
    late = late * jnp.where(late_max > 1e-6, config.LATE_NORM_PEAK / late_max, 1.0)

    early_ref[0, :, :] = early
    late_ref[0, :, :] = late


def pack_draws(
    shape: IRShape,
    delays: np.ndarray,
    strengths: np.ndarray,
    noise: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-entry explicit draws into the kernel's tiled layouts.

    delays/strengths: (B, R≤128) → (B, 8, 128) with row 0 carrying the taps;
    noise: (B, ≥late_length) flat → (B, 8, cols) column-major.
    """
    batch = delays.shape[0]
    l_pad = _pad_to_tile(shape.length)
    cols = l_pad // SUBLANE

    d = np.zeros((batch, SUBLANE, LANE), dtype=np.int32)
    s = np.zeros((batch, SUBLANE, LANE), dtype=np.float32)
    d[:, 0, : delays.shape[1]] = delays
    s[:, 0, : strengths.shape[1]] = strengths

    n_flat = np.zeros((batch, l_pad), dtype=np.float32)
    n_flat[:, : noise.shape[1]] = noise[:, :l_pad]
    n_cm = n_flat.reshape(batch, cols, SUBLANE).transpose(0, 2, 1)
    return d, s, np.ascontiguousarray(n_cm)


def fused_rir_bank(
    seeds: jax.Array,
    shape: IRShape,
    scalars: IRScalars,
    interpret: bool = False,
    injected_draws: Tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Synthesize a bank of (early, late) IRs → two (B, length) arrays.

    seeds: (B,) int32 — one PRNG stream per bank entry (ignored when
    ``injected_draws`` supplies explicit randomness; see pack_draws).
    scalars: IRScalars of per-entry (B,) arrays OR scalars (broadcast).
    """
    if shape.length > MAX_BANK_IR_LENGTH and interpret is False:
        raise ValueError(
            f"IR length {shape.length} exceeds the fused bank's VMEM budget "
            f"(max {MAX_BANK_IR_LENGTH}); use the jnp IR backend"
        )
    seeds = jnp.asarray(seeds, dtype=jnp.int32)
    batch = seeds.shape[0]
    l_pad = _pad_to_tile(shape.length)
    cols = l_pad // SUBLANE

    def as_col(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x, (batch,)) if x.ndim == 0 else x

    scal = jnp.stack(
        [
            as_col(scalars.one_minus_absorption),
            as_col(scalars.directionality),
            as_col(scalars.log_decay_factor),
            as_col(scalars.initial_late_amp),
        ],
        axis=1,
    )  # (B, 4)

    if interpret is True:
        # the generic HLO interpreter lacks the TPU PRNG primitives; the
        # TPU-specific interpreter emulates them on CPU
        interpret = pltpu.InterpretParams()

    injected = injected_draws is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 1) seed table
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 4) scalar table
    ]
    inputs = [seeds[:, None], scal]
    if injected:
        tap_spec = pl.BlockSpec(
            (1, SUBLANE, LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        noise_spec = pl.BlockSpec(
            (1, SUBLANE, cols), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [tap_spec, tap_spec, noise_spec]
        d, s, n = injected_draws
        inputs += [jnp.asarray(d), jnp.asarray(s), jnp.asarray(n)]

    kernel = functools.partial(
        _rir_bank_kernel, shape=shape, cols=cols, injected=injected
    )
    early, late = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, SUBLANE, cols), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANE, cols), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, SUBLANE, cols), jnp.float32),
            jax.ShapeDtypeStruct((batch, SUBLANE, cols), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    # column-major tile → flat sample order: (B, 8, C) -> (B, C, 8) -> (B, L)
    early_flat = jnp.transpose(early, (0, 2, 1)).reshape(batch, l_pad)
    late_flat = jnp.transpose(late, (0, 2, 1)).reshape(batch, l_pad)
    return early_flat[:, : shape.length], late_flat[:, : shape.length]
