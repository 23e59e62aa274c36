"""Fused Pallas kernel: ball query + neighbor grouping.

The XLA pipeline (ball_query -> take_along_axis gather) spends ~10 ms per
(1024x2048, K=32) call at batch 16 because TPU gathers of short rows run at
a few GB/s. Here the selection one-hot (Mt, N) built for each of the K
extraction steps is immediately CONTRACTED on the MXU against the feature
table sitting in VMEM:

    out_k (Mt, C) = onehot_k (Mt, N) @ features (N, C)

so the gather becomes K small matmuls and the indices/one-hots never touch
HBM. Also emits the center-relative coordinates (reference BallQuery
module, models/pvcnn2.py:94-111) in the same pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bqg_kernel(r2_ref, centers_ref, points_ref, feats_ref, out_ref,
                key_buf):
    # centers_ref: (1, Mt, 3); points_ref: (1, 3, N); feats_ref: (1, N, C)
    # out_ref: (1, Mt, K, 3 + C)
    mt = centers_ref.shape[1]
    n = points_ref.shape[2]
    k = out_ref.shape[2]
    c = feats_ref.shape[2]
    r2 = r2_ref[0]

    pts = points_ref[0]          # (3, N)
    ctr = centers_ref[0]         # (Mt, 3)
    # single gather table: [xyz ++ features] (N, 3+C)
    table = jnp.concatenate([pts.T, feats_ref[0]], axis=1)

    d2 = jnp.zeros((mt, n), jnp.float32)
    for d in range(3):
        diff = ctr[:, d:d + 1] - pts[d:d + 1, :]
        d2 = d2 + diff * diff
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    key_buf[...] = jnp.where(d2 < r2, lane, n)

    def gather_onehot(onehot):
        # gather-as-matmul on the MXU: (Mt, N) @ (N, 3+C)
        g = jax.lax.dot_general(onehot, table, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return g.at[:, :3].add(-ctr) if False else             jnp.concatenate([g[:, :3] - ctr, g[:, 3:]], axis=1)

    def body(j, _):
        key = key_buf[...]
        idx_j = jnp.min(key, axis=1, keepdims=True)      # (Mt, 1)
        valid = idx_j < n
        onehot = jnp.where(jnp.logical_and(key == idx_j, valid), 1.0, 0.0)
        row = gather_onehot(onehot)                      # (Mt, 3+C)
        # misses replicate slot 0 (CUDA pad semantics)
        out_ref[0, :, j, :] = jnp.where(valid, row, out_ref[0, :, 0, :])
        key_buf[...] = jnp.where(lane == idx_j, n, key)
        return 0

    # slot 0 first (its fallback for an empty row is point 0's data)
    key0 = key_buf[...]
    idx0 = jnp.min(key0, axis=1, keepdims=True)
    valid0 = idx0 < n
    sel0 = jnp.where(key0 == jnp.where(valid0, idx0, 0), 1.0, 0.0)
    empty_onehot = jnp.where(lane == 0, 1.0, 0.0)
    onehot0 = jnp.where(valid0, sel0, empty_onehot)
    out_ref[0, :, 0, :] = gather_onehot(onehot0)
    key_buf[...] = jnp.where(lane == idx0, n, key0)

    lax.fori_loop(1, k, body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def ball_query_group_pallas(points: jnp.ndarray, centers: jnp.ndarray,
                            features, radius: float, num_neighbors: int,
                            include_coordinates: bool = True):
    """points (B,N,3), centers (B,M,3), features (B,N,C) ->
    (B, M, K, 3+C) [rel_coords ++ features] (or (B,M,K,3) without feats)."""
    b, n, _ = points.shape
    m = centers.shape[1]
    k = num_neighbors
    c = 0 if features is None else features.shape[2]
    mt = min(m, 128)
    assert m % mt == 0
    feats = jnp.zeros((b, n, 0), jnp.float32) if features is None \
        else features.astype(jnp.float32)
    points_t = jnp.transpose(points, (0, 2, 1)).astype(jnp.float32)
    r2 = jnp.full((1,), jnp.float32(radius) ** 2)

    out = pl.pallas_call(
        _bqg_kernel,
        out_shape=jax.ShapeDtypeStruct((b, m, k, 3 + c), jnp.float32),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mt, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mt, k, 3 + c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mt, n), jnp.int32)],
    )(r2, centers.astype(jnp.float32), points_t, feats)

    if not include_coordinates and c > 0:
        return out[..., 3:]
    if c == 0:
        return out[..., :3]
    return out
