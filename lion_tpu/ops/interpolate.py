"""3-nearest-neighbor inverse-distance interpolation (TPU-native).

Reference semantics (re-implemented):
  third_party/pvcnn/functional/src/interpolate/neighbor_interpolate.cu:20-75
  -- exact 3-NN by SQUARED distance, clamped to [1e-10, 1e10]; weights
  w_i = prod(d_j, j!=i) / sum_k prod(d_j, j!=k)  (i.e. inverse-distance).
  Backward is a scatter-add into centers_features -- free via JAX autodiff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .points import pairwise_sqdist


def three_nn(points: jnp.ndarray, centers: jnp.ndarray):
    """points (B, N, 3), centers (B, M, 3) -> (d2 (B,N,3), idx (B,N,3)).

    When M < 3 the missing slots get index 0 and distance 1e10, matching the
    CUDA kernel's untouched-initializer behavior (neighbor_interpolate.cu:
    best* start at 1e40, clamped to 1e10)."""
    m = centers.shape[1]
    d2 = pairwise_sqdist(points, centers)  # (B, N, M)
    k = min(3, m)
    neg_d, idx = jax.lax.top_k(-d2, k)
    if k < 3:
        pad = 3 - k
        neg_d = jnp.pad(neg_d, ((0, 0), (0, 0), (0, pad)),
                        constant_values=-1e10)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
    return -neg_d, idx.astype(jnp.int32)


def nearest_neighbor_interpolate(points: jnp.ndarray, centers: jnp.ndarray,
                                 centers_features: jnp.ndarray) -> jnp.ndarray:
    """points (B,N,3), centers (B,M,3), centers_features (B,M,C) -> (B,N,C)."""
    d2, idx = three_nn(points, centers)
    d2 = jnp.clip(d2, 1e-10, 1e10)
    d0, d1, d2_ = d2[..., 0], d2[..., 1], d2[..., 2]
    d0d1, d0d2, d1d2 = d0 * d1, d0 * d2_, d1 * d2_
    inv = 1.0 / (d0d1 + d0d2 + d1d2)
    w = jnp.stack([d1d2 * inv, d0d2 * inv, d0d1 * inv], axis=-1)  # (B, N, 3)

    b, n, _ = idx.shape
    gathered = jnp.take_along_axis(
        centers_features, idx.reshape(b, n * 3)[:, :, None], axis=1)
    gathered = gathered.reshape(b, n, 3, -1)
    w = jax.lax.stop_gradient(w)
    return jnp.sum(gathered * w[..., None].astype(gathered.dtype), axis=2)
