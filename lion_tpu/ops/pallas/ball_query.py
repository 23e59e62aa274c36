"""Pallas TPU kernel for ball query.

Replaces the XLA top_k formulation, whose sort lowering costs ~10ms per
(1024x2048) call at batch 16. This kernel computes the exact
subtract-square distances for a tile of centers against all points (VPU,
in VMEM), then extracts the first K in-radius indices with K masked-min
sweeps -- no sort, no HBM round trips for intermediates.

Semantics identical to the CUDA kernel (ball_query.cu:19-50) and the XLA
path: first K hits in index order; empty rows yield 0; partial rows repeat
the first hit (the padding is applied by the caller-side epilogue).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bq_kernel(r2_ref, centers_ref, points_ref, out_ref, key_buf):
    # centers_ref: (1, Mt, 3); points_ref: (1, 3, N); out_ref: (1, Mt, K)
    # key_buf: (Mt, N) int32 scratch -- large loop state must live in VMEM
    # scratch (a vector-valued scf.for carry fails to legalize in Mosaic)
    mt = centers_ref.shape[1]
    n = points_ref.shape[2]
    k = out_ref.shape[2]
    r2 = r2_ref[0]

    pts = points_ref[0]  # (3, N)
    d2 = jnp.zeros((mt, n), jnp.float32)
    for d in range(3):
        c = centers_ref[0, :, d:d + 1]          # (Mt, 1)
        p = pts[d:d + 1, :]                      # (1, N)
        diff = c - p
        d2 = d2 + diff * diff
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    key_buf[...] = jnp.where(d2 < r2, lane, n)
    out_ref[0] = jnp.zeros((mt, k), jnp.int32)
    col = lax.broadcasted_iota(jnp.int32, (mt, k), 1)

    def body(j, _):
        key = key_buf[...]
        idx_j = jnp.min(key, axis=1, keepdims=True)  # (Mt, 1) first hit
        out_ref[0] = jnp.where(col == j, idx_j, out_ref[0])
        key_buf[...] = jnp.where(lane == idx_j, n, key)
        return 0

    lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnums=(3,))
def ball_query_pallas(centers: jnp.ndarray, points: jnp.ndarray,
                      radius: float, num_neighbors: int) -> jnp.ndarray:
    """centers (B, M, 3), points (B, N, 3) -> (B, M, K) int32."""
    b, m, _ = centers.shape
    n = points.shape[1]
    k = num_neighbors
    mt = min(m, 256)
    assert m % mt == 0, (m, mt)
    points_t = jnp.transpose(points, (0, 2, 1)).astype(jnp.float32)
    r2 = jnp.full((1,), jnp.float32(radius) ** 2)

    raw = pl.pallas_call(
        _bq_kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, k), jnp.int32),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mt, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mt, n), jnp.int32)],
    )(r2, centers.astype(jnp.float32), points_t)

    # epilogue: sentinel n -> pad with first hit (or 0 when no hits)
    valid = raw < n
    idx = jnp.where(valid, raw, 0)
    first = idx[..., 0:1]
    return jnp.where(valid, idx, jnp.broadcast_to(first, idx.shape))
