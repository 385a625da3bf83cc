"""Block-partitioned overlap-add convolution across a device mesh axis.

The audio analog of context/sequence parallelism (SURVEY §5.7): a long clip
is split into equal sample blocks across the "block" mesh axis; every device
convolves its block against the (replicated) IR with a local power-of-two
FFT, then the length-(L−1) overlap tails ride a ring of `ppermute`s to the
downstream neighbors and are added in.  This keeps per-device FFT size and
HBM flat as clip length grows with the mesh, and all communication is
neighbor-only over ICI.

The reference convolves whole clips in one shot (raytracer_studio.py:362)
and has no partitioning of any kind; this module is the scale-out design the
north star asks for, not a translation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import convolution
from . import mesh as meshlib


def _ring_overlap_add(local_out: jnp.ndarray, tail: jnp.ndarray, axis_name: str,
                      num_blocks: int, block_len: int,
                      wrap: bool = True) -> jnp.ndarray:
    """Shift conv tails downstream around the ring and accumulate.

    local_out: (..., block_len) — this device's in-block samples.
    tail: (..., L-1) — samples this device's convolution spills past its block.
    After ceil((L-1)/block_len) hops every spilled sample has landed on the
    device that owns its output position.  Wrap-around from the last device
    reaches only zero-padded ghost blocks, so it adds zeros by construction —
    *when the grid is padded by the kernel tail*.  Callers whose signal runs
    to the end of the grid (e.g. the sharded meter's K-weighting FIR) pass
    ``wrap=False``: spill arriving back at device 0 is dropped, making the
    result the truncated *linear* convolution instead of the circular one.
    """
    tail_len = tail.shape[-1]
    steps = max(0, math.ceil(tail_len / block_len))
    perm = [(i, (i + 1) % num_blocks) for i in range(num_blocks)]
    for _ in range(steps):
        tail = jax.lax.ppermute(tail, axis_name, perm)
        if not wrap:
            # device 0 has no upstream predecessor in linear order: anything
            # it receives came around the ring — drop it (and, by zeroing the
            # carried tail here, everything it would propagate onward)
            idx = jax.lax.axis_index(axis_name)
            tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
        chunk = tail[..., :block_len]
        if chunk.shape[-1] < block_len:
            pad = [(0, 0)] * (chunk.ndim - 1) + [(0, block_len - chunk.shape[-1])]
            chunk = jnp.pad(chunk, pad)
        local_out = local_out + chunk
        remainder = tail[..., block_len:]
        # keep the carried tail a fixed shape across iterations (pad with 0)
        tail = jnp.pad(
            remainder,
            [(0, 0)] * (remainder.ndim - 1) + [(0, tail_len - remainder.shape[-1])],
        )
    return local_out


def padded_length(n_in: int, ir_length: int, num_blocks: int) -> int:
    """Total (host-padded) signal length: multiple of num_blocks covering N+L−1."""
    needed = n_in + ir_length - 1
    block = math.ceil(needed / num_blocks)
    return block * num_blocks


@functools.lru_cache(maxsize=32)
def _partitioned_fn(device_mesh: Mesh, axis_name: str, block_len: int, l: int):
    """Jitted shard_map program for one (mesh, block, kernel-length) — built
    ONCE (rebuilding the wrapper per call re-traces the whole ring program
    on every dispatch; the cache holds function objects only)."""
    num_blocks = device_mesh.shape[axis_name]

    def local(block_cn: jnp.ndarray, ker: jnp.ndarray) -> jnp.ndarray:
        out_len = block_len + l - 1
        conv = convolution.convolve_full(block_cn, ker, out_len)  # (K, C, out)
        local_out = conv[..., :block_len]
        tail = conv[..., block_len:]
        return _ring_overlap_add(local_out, tail, axis_name, num_blocks, block_len)

    shard = jax.shard_map(
        local,
        mesh=device_mesh,
        in_specs=(P(None, axis_name), P(None, None)),
        out_specs=P(None, None, axis_name),
    )
    return jax.jit(shard)


def partitioned_convolve(
    signal_cn: jnp.ndarray,
    kernels: jnp.ndarray,
    device_mesh: Mesh,
    axis_name: str = meshlib.BLOCK_AXIS,
) -> jnp.ndarray:
    """Convolve (C, N) with (K, L) kernels, N sharded over the mesh axis.

    N must already be padded to a multiple of the axis size and to at least
    N_signal + L − 1 (see ``padded_length``); the trailing pad must be zeros.
    Returns (K, C, N) sharded the same way — the linear convolution of the
    unpadded signal lives in the first N_signal + L − 1 samples.
    """
    num_blocks = device_mesh.shape[axis_name]
    n_total = signal_cn.shape[-1]
    if n_total % num_blocks:
        raise ValueError(f"signal length {n_total} not divisible by {num_blocks}")
    block_len = n_total // num_blocks
    _k, l = kernels.shape
    fn = _partitioned_fn(device_mesh, axis_name, block_len, int(l))
    return fn(signal_cn, kernels)
