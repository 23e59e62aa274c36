"""Pallas TPU kernel for furthest point sampling.

FPS is an inherently sequential argmax chain (reference CUDA:
third_party/pvcnn/functional/src/sampling/sampling.cu:86-167). The pure-XLA
fori_loop version dispatches ~M tiny ops per call; this kernel instead runs
the WHOLE chain on-chip: coords (3, N) and the running min-distance (1, N)
live in VMEM, each iteration is one fused VPU sweep (distance + min +
argmax) with zero HBM traffic. Semantics identical to the CUDA kernel:
index 0 seeds the chain, ties resolve to the lowest index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(coords_ref, out_ref, min_d2, idx_row):
    # coords_ref: (1, 3, N) VMEM; out_ref: (1, 1, M) VMEM int32
    n = coords_ref.shape[2]
    m = out_ref.shape[2]
    xyz = coords_ref[0]  # (3, N)
    x, y, z = xyz[0:1], xyz[1:2], xyz[2:3]  # (1, N)

    min_d2[...] = jnp.full((1, n), jnp.inf, jnp.float32)
    idx_row[...] = jnp.zeros((1, m), jnp.int32)  # slot 0 seeds index 0

    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    slot = lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(j, last):
        # gather the last center's coords (dynamic lane select via masked max)
        sel = lane == last
        cx = jnp.max(jnp.where(sel, x, -jnp.inf))
        cy = jnp.max(jnp.where(sel, y, -jnp.inf))
        cz = jnp.max(jnp.where(sel, z, -jnp.inf))
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        new_min = jnp.minimum(min_d2[...], d2)
        min_d2[...] = new_min
        # argmax with lowest-index tie-break
        best = jnp.max(new_min)
        nxt = jnp.min(jnp.where(new_min == best, lane, n)).astype(jnp.int32)
        idx_row[...] = jnp.where(slot == j, nxt, idx_row[...])
        return nxt

    lax.fori_loop(1, m, body, jnp.int32(0))
    out_ref[0] = idx_row[...]


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample_idx_pallas(coords: jnp.ndarray,
                                     num_samples: int) -> jnp.ndarray:
    """coords (B, N, 3) -> (B, num_samples) int32. TPU fast path."""
    b, n, _ = coords.shape
    coords_t = jnp.transpose(coords, (0, 2, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, num_samples), jnp.int32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, num_samples), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, num_samples), jnp.int32)],
    )(coords_t)
    return out[:, 0, :]
