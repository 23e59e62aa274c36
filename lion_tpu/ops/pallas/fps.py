"""Pallas TPU kernel for furthest point sampling.

FPS is an inherently sequential argmax chain (reference CUDA:
third_party/pvcnn/functional/src/sampling/sampling.cu:86-167). The pure-XLA
fori_loop version dispatches ~M tiny ops per call; this kernel runs the
WHOLE chain on-chip with the BATCH laid out over sublanes: coords (3, B, N)
and the running min-distance (B, N) live in VMEM, and every iteration is
one fused VPU sweep over all batch rows simultaneously (distance + min +
per-row argmax). M iterations total -- independent of batch size (a
grid-over-batch variant serializes, since Pallas grid programs run
sequentially on a core).

Semantics match the CUDA kernel: index 0 seeds the chain; ties resolve to
the lowest index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(coords_ref, out_ref, min_d2, idx_buf):
    # coords_ref: (3, B, N); out_ref: (B, M) int32
    _, b, n = coords_ref.shape
    m = out_ref.shape[1]
    x = coords_ref[0]  # (B, N)
    y = coords_ref[1]
    z = coords_ref[2]

    min_d2[...] = jnp.full((b, n), jnp.inf, jnp.float32)
    idx_buf[...] = jnp.zeros((b, m), jnp.int32)  # slot 0 seeds index 0

    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    slot = lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def body(j, last):
        # last: (B, 1) int32 -- per-row previous pick
        sel = lane == last  # (B, N)
        cx = jnp.max(jnp.where(sel, x, -jnp.inf), axis=1, keepdims=True)
        cy = jnp.max(jnp.where(sel, y, -jnp.inf), axis=1, keepdims=True)
        cz = jnp.max(jnp.where(sel, z, -jnp.inf), axis=1, keepdims=True)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        new_min = jnp.minimum(min_d2[...], d2)
        min_d2[...] = new_min
        # per-row argmax with lowest-index tie-break
        best = jnp.max(new_min, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(new_min == best, lane, n), axis=1,
                      keepdims=True).astype(jnp.int32)  # (B, 1)
        idx_buf[...] = jnp.where(slot == j, nxt, idx_buf[...])
        return nxt

    lax.fori_loop(1, m, body, jnp.zeros((b, 1), jnp.int32))
    out_ref[...] = idx_buf[...]


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample_idx_pallas(coords: jnp.ndarray,
                                     num_samples: int) -> jnp.ndarray:
    """coords (B, N, 3) -> (B, num_samples) int32. TPU fast path."""
    b, n, _ = coords.shape
    coords_t = jnp.transpose(coords, (2, 0, 1)).astype(jnp.float32)
    return pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32),
                        pltpu.VMEM((b, num_samples), jnp.int32)],
    )(coords_t)
