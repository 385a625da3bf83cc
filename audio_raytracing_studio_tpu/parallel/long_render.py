"""Sequence-parallel rendering of arbitrarily long clips (SURVEY §5.7).

One clip's sample axis is sharded over the mesh's "block" axis; every stage
of the render is either blockwise-local (convolution via overlap-add with a
ring ppermute halo — partitioned_conv), elementwise (mix, pan), a cheap
collective (global max for the conditional normalizations → lax.pmax), or a
small neighbor halo (the 12/18 ms layout-mapping delays → one ppermute).
Per-device FFT size and HBM stay flat as clip length grows with the mesh —
the reference would instead take one O(N log N) FFT over the whole clip
(raytracer_studio.py:362) and run out of memory.

Long mode applies the air-absorption gain on the block convolution spectra
(see StaticSpec.fast_air; same ≤1e-3 envelope).  The shelf EQ — a
whole-signal circular filter at the exact output length in the reference —
runs as the distributed exact-length Bluestein transform over the block axis
(parallel.distributed_fft), so non-unity EQ gains work at any clip length
with flat per-device memory.  Metering runs on device, block-sharded.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..models import pipeline
from ..ops import convolution, filters, spatial
from ..params import RenderParams
from . import distributed_fft
from . import mesh as meshlib
from .partitioned_conv import _ring_overlap_add


def _pmax_abs(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    return jax.lax.pmax(jnp.max(jnp.abs(x)), axis_name)


def _normalize_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Conditional peak normalization with a cross-block max (ref :402-404)."""
    max_val = _pmax_abs(x, axis_name)
    scale = jnp.where(max_val > 1.0, 1.0 / max_val, 1.0)
    return jnp.where(max_val < 1e-9, jnp.zeros_like(x), x * scale)


def _delay_sharded(x: jnp.ndarray, delay: int, axis_name: str, num_blocks: int) -> jnp.ndarray:
    """Delay (..., n_block) by ``delay`` samples across block boundaries.

    The first ``delay`` samples of each block come from the previous block's
    tail (one ppermute hop; requires delay ≤ block length, true for the
    12/18 ms layout delays at any practical block size).
    """
    if delay <= 0:
        return x
    n = x.shape[-1]
    if delay > n:
        # x[..., n-delay:] would silently become a SHORTER tail (negative
        # index wraps) and the output channels come out time-mangled with no
        # shape error — refuse instead; callers need a bigger block length
        raise ValueError(
            f"layout delay ({delay} samples) exceeds the per-device block "
            f"length ({n}); use fewer blocks or a longer clip"
        )
    tail = x[..., n - delay :]
    perm = [(i, (i + 1) % num_blocks) for i in range(num_blocks)]
    prev_tail = jax.lax.ppermute(tail, axis_name, perm)
    # block 0 has no predecessor: its head is zeros (ref zero-pads, :513)
    idx = jax.lax.axis_index(axis_name)
    prev_tail = jnp.where(idx == 0, jnp.zeros_like(prev_tail), prev_tail)
    return jnp.concatenate([prev_tail, x[..., : n - delay]], axis=-1)


def _map_layout_sharded(
    six: jnp.ndarray, layout: str, rate: int, z_pos, axis_name: str, num_blocks: int
) -> jnp.ndarray:
    """Blockwise map_channels (ops.spatial.map_layout with sharded delays)."""
    if layout == "Stereo":
        c = config.DOWNMIX_CENTER_GAIN
        r = config.DOWNMIX_REAR_GAIN
        left = six[..., 0, :] + six[..., 2, :] * c + six[..., 4, :] * r
        right = six[..., 1, :] + six[..., 2, :] * c + six[..., 5, :] * r
        return jnp.stack([left, right], axis=-2)
    if layout == "5.1 (Standard)":
        return six
    if layout == "7.1 (Surround)":
        delay = int(rate * config.SIDE_DELAY_MS / 1000)
        sides = _delay_sharded(six[..., 4:6, :], delay, axis_name, num_blocks)
        return jnp.concatenate([six, sides * config.SIDE_GAIN], axis=-2)
    if layout == "5.1.2 (Atmos Light)":
        delay = int(rate * config.HEIGHT_DELAY_MS / 1000)
        height_gain = jnp.clip(z_pos, 0.0, 1.0) * config.HEIGHT_Z_GAIN
        heights = _delay_sharded(six[..., 4:6, :], delay, axis_name, num_blocks)
        return jnp.concatenate([six, heights * height_gain], axis=-2)
    # unknown layout → 5.1, matching ops.spatial.map_layout's fallback to
    # DEFAULT_CHANNEL_LAYOUT (the exact path must not diverge from long mode)
    return six


def _sharded_metrics(
    out_block: jnp.ndarray,
    rate: int,
    len_out: int,
    axis_name: str,
    num_blocks: int,
    block_len: int,
):
    """On-device LUFS / sample-peak / RMS of a block-sharded render.

    ROADMAP item: the K-weighting FIR rides the same ring overlap-add as the
    signal convolution (wrap-free: linear-conv semantics); each shard sums
    its local overlap with every host-precomputed gating block from an
    energy cumsum, and one psum of the (J,)-vector of contributions gives
    exact block energies — every shard then computes the identical gated
    loudness.
    """
    from ..metering import kweighting as kwc
    from ..metering.loudness import gated_loudness_from_blocks, k_weighting_fir

    idx = jax.lax.axis_index(axis_name)
    offset = idx * block_len
    pos = offset + jnp.arange(block_len)
    valid = (pos < len_out).astype(jnp.float32)

    # --- sample peak / RMS over all channels (reference conventions) ---
    abs_max = jax.lax.pmax(jnp.max(jnp.abs(out_block) * valid[None, :]), axis_name)
    peak_db = jnp.where(
        abs_max > 1e-15, 20.0 * jnp.log10(jnp.maximum(abs_max, 1e-30)), -jnp.inf
    )
    sq_sum = jax.lax.psum(jnp.sum(jnp.square(out_block) * valid[None, :]), axis_name)
    rms = jnp.sqrt(sq_sum / (len_out * out_block.shape[0]))
    rms_db = jnp.where(
        rms > 1e-15, 20.0 * jnp.log10(jnp.maximum(rms, 1e-30)), -jnp.inf
    )

    # --- LUFS: mono mixdown of the first two channels (ref :687-688) ---
    mono = 0.5 * (out_block[0] + out_block[1]) * valid
    mono_peak = jax.lax.pmax(jnp.max(jnp.abs(mono)), axis_name)

    fir = jnp.asarray(k_weighting_fir(rate).astype(np.float32))
    fir_len = fir.shape[0]
    conv = convolution.convolve_pairwise(
        mono[None, :], fir[None, :], block_len + fir_len - 1
    )
    # wrap=False: the meter signal runs to within < fir_len of the grid end,
    # so ring wrap-around would add the clip ending's K-weighted tail into
    # block 0 — a circular convolution the exact meter does not compute
    kw_local = _ring_overlap_add(
        conv[..., :block_len], conv[..., block_len:], axis_name, num_blocks,
        block_len, wrap=False,
    )[0]

    # gating-block energies as per-shard contributions: each shard sums its
    # own overlap with every block, one psum of a (J,) vector assembles the
    # exact totals.  The prefixes are SEGMENTED: a flat cumsum over the whole
    # shard would make every block energy the difference of two prefixes up
    # to shard magnitude — ~ulp(shard energy) of error per block, ~0.05 dB
    # at hour scale on a 2-block mesh (the CLAUDE.md cumsum-precision
    # hazard).  With segments of L ≥ one gating block, every difference is
    # intra-segment (a block touches ≤ 2 segments), so the error is bounded
    # by ~log2(L)·eps·segment_energy regardless of clip or shard length —
    # the same bounding idea as the streaming meter's 30 s chunks.
    sq = jnp.square(kw_local)
    max_block = max(1, int(np.ceil(kwc.BLOCK_SECONDS * rate)))
    seg_len = 1 << (max_block - 1).bit_length()  # pow2 ≥ one block span
    n_seg = -(-block_len // seg_len)
    sq_seg = jnp.pad(sq, (0, n_seg * seg_len - block_len)).reshape(n_seg, seg_len)
    # E[s, k] = energy of the first k samples of segment s (k in 0..L)
    eseg = jnp.concatenate(
        [jnp.zeros((n_seg, 1), jnp.float32), jnp.cumsum(sq_seg, axis=-1)],
        axis=-1,
    )
    eflat = eseg.reshape(-1)
    row = seg_len + 1

    from ..metering.loudness import _block_bounds

    lo, hi, jblocks = _block_bounds(len_out, rate)
    if jblocks <= 0:
        lufs = jnp.float32(-jnp.inf)
    else:
        lo_d = jnp.asarray(lo[:jblocks])  # (J,) host-static bounds
        hi_d = jnp.asarray(hi[:jblocks])
        a = jnp.clip(lo_d - offset, 0, block_len)
        b = jnp.clip(hi_d - offset, 0, block_len)
        sa = jnp.minimum(a // seg_len, n_seg - 1)
        # this shard's slice of block j = [a, cut) in segment sa
        #                               + [sb·L, b) in segment sb (if b spills)
        cut = jnp.clip(b, a, (sa + 1) * seg_len)
        part1 = eflat[sa * row + (cut - sa * seg_len)] - eflat[
            sa * row + (a - sa * seg_len)
        ]
        # segment of the block's last sample; min() guards the a == b ==
        # block_len edge (a shard the block lies entirely past), where an
        # unclamped index would gather out of bounds
        sb = jnp.minimum(jnp.maximum(b - 1, a) // seg_len, n_seg - 1)
        part2 = jnp.where(
            sb > sa, eflat[sb * row + (b - sb * seg_len)], 0.0
        )
        contrib = part1 + part2
        block_energy = jax.lax.psum(contrib, axis_name)  # (J,) exact totals
        z = block_energy / (kwc.BLOCK_SECONDS * rate)
        lufs = gated_loudness_from_blocks(z[None, :], jnp.ones(1, jnp.float32))
    lufs = jnp.where(mono_peak < 1e-6, -jnp.inf, lufs)
    return lufs.astype(jnp.float32), peak_db.astype(jnp.float32), rms_db.astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def _compiled_long(
    device_mesh: Mesh,
    axis_name: str,
    spec,
    kernel_is_late: tuple,
    pairwise: bool,
    block_len: int,
    l: int,
    len_out: int,
    num_blocks: int,
    with_metrics: bool,
):
    """Build + jit the shard-mapped long-render step for one static config.

    Module-level cache with the traced MixScalars as ARGUMENTS (the
    models.pipeline / streaming_eq idiom): a per-call closure would re-trace
    every render and bake the parameter scalars into HLO literals, so even
    the persistent compile cache would miss on every parameter change
    (CLAUDE.md: the 13 s/render host tax).  The cache holds only the jitted
    callable — no traced arrays.
    """

    def local(audio_block: jnp.ndarray, kers: jnp.ndarray, scal) -> jnp.ndarray:
        # --- wet path: block conv + ring overlap-add, air gain on kernels ---
        out_len_local = block_len + l - 1
        if pairwise:
            conv = convolution.convolve_pairwise(audio_block, kers, out_len_local)
            wet_local = conv[..., :block_len]
            tail = conv[..., block_len:]
            wet = _ring_overlap_add(wet_local, tail, axis_name, num_blocks, block_len)
        else:
            nfft = convolution.fast_fft_length(out_len_local)
            gains = None
            if spec.air_on and kernel_is_late:  # fast_air: gain on the block conv grid
                air_gain = filters.air_absorption_gain(nfft, spec.rate, scal.air_absorption)
                gains = jnp.stack(
                    [air_gain if is_late else jnp.ones_like(air_gain)
                     for is_late in kernel_is_late]
                )
            conv = convolution.convolve_full(
                audio_block, kers, out_len_local, kernel_gains=gains
            )
            local_out = conv[..., :block_len]
            tail = conv[..., block_len:]
            conv_oa = _ring_overlap_add(local_out, tail, axis_name, num_blocks, block_len)

            if spec.early_on and spec.late_on:
                wet = conv_oa[0] * scal.early_level + conv_oa[1] * scal.late_level
            elif spec.early_on:
                wet = conv_oa[0] * scal.early_level
            elif spec.late_on:
                wet = conv_oa[0] * scal.late_level
            else:
                wet = jnp.zeros((2, block_len), jnp.float32)

        # --- mix, EQ, normalize, pan, map (blockwise + collectives) ---
        mixed = scal.dry_factor * (1.0 - scal.dry_wet) * audio_block + scal.dry_wet * wet
        if spec.eq_on:
            mixed = distributed_fft.shelf_eq_sharded(
                mixed, spec.rate, scal.bass_gain, scal.treble_gain,
                len_out, axis_name, num_blocks,
            )
        mixed = _normalize_sharded(mixed, axis_name)
        six = spatial.apply_pan(mixed, spatial.pan_matrix(scal.x_pos, scal.y_pos, scal.z_pos))
        six = _normalize_sharded(six, axis_name)
        out = _map_layout_sharded(six, spec.layout, spec.rate, scal.z_pos, axis_name, num_blocks)
        out = _normalize_sharded(out, axis_name)
        if not with_metrics:
            return out, (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        metrics = _sharded_metrics(
            out, spec.rate, len_out, axis_name, num_blocks, block_len
        )
        return out, metrics

    return jax.jit(
        jax.shard_map(
            local,
            mesh=device_mesh,
            in_specs=(P(None, axis_name), P(None, None), P()),
            out_specs=(P(None, axis_name), (P(), P(), P())),
            check_vma=False,
        )
    )


def render_long(
    audio: np.ndarray,
    rate: int,
    p: RenderParams,
    device_mesh: Mesh,
    seed: int = 0,
    axis_name: str = meshlib.BLOCK_AXIS,
    external_ir: Optional[np.ndarray] = None,
    external_ir_rate: Optional[int] = None,
    with_metrics: bool = False,
):
    """Render one long clip with its sample axis sharded over the mesh.

    Internal-hall or external-IR path.  Non-unity shelf-EQ gains run through
    the distributed exact-length transform (needs a power-of-two block
    axis).  Returns (len_out, channels) float32.
    """
    audio_nc = pipeline._ensure_stereo_host(audio)
    n_in = audio_nc.shape[0]

    # IR/spec/scalar preparation — ONE implementation shared with the
    # single-chip streaming renderer (parallel.streaming._build_kernels);
    # the two long-clip paths must not drift apart here.
    from .streaming import _build_kernels

    kernels_arr, kernel_is_late, pairwise, spec, scal = _build_kernels(
        p, rate, n_in, int(seed), external_ir, external_ir_rate
    )

    num_blocks = device_mesh.shape[axis_name]
    len_out = spec.len_out
    if spec.eq_on:
        # the distributed exact-length EQ needs blocks aligned with its
        # pow2 four-step FFT layout (parallel.distributed_fft)
        if not distributed_fft.is_power_of_two(num_blocks):
            raise ValueError(
                "render_long with non-unity EQ gains requires a power-of-two "
                f"block axis (got {num_blocks})"
            )
        block_len = distributed_fft.block_len_for(len_out, num_blocks)
    else:
        block_len = math.ceil(len_out / num_blocks)
    # round block length up so the IR tail halo is a bounded number of hops
    n_total = block_len * num_blocks

    audio_cn = np.zeros((2, n_total), dtype=np.float32)
    audio_cn[:, :n_in] = audio_nc.T

    l = int(kernels_arr.shape[-1])
    shard = _compiled_long(
        device_mesh, axis_name, spec, tuple(kernel_is_late), bool(pairwise),
        block_len, l, len_out, num_blocks, bool(with_metrics),
    )
    out_cn, (lufs, peak, rms) = shard(jnp.asarray(audio_cn), kernels_arr, scal)
    result = np.asarray(out_cn).T[:len_out]
    if with_metrics:
        return result, {
            "lufs": float(lufs),
            "true_peak_dbfs": float(peak),
            "rms_dbfs": float(rms),
        }
    return result
