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

    Three masked-argmin sweeps instead of lax.top_k: top_k lowers to a FULL
    sort of the (B, N, M) distance matrix on TPU (~8 ms at B=16 for
    2048x1024 vs ~0.5 ms for the sweeps). Ties resolve to the lowest index
    (argmin first-occurrence), matching the CUDA strict-less update
    (neighbor_interpolate.cu:44-59).

    When M < 3 the missing slots get index 0 and distance 1e10, matching
    the CUDA kernel's untouched-initializer behavior (best* start at 1e40,
    clamped to 1e10)."""
    m = centers.shape[1]
    d2 = pairwise_sqdist(points, centers)  # (B, N, M)
    dists, idxs = [], []
    work = d2
    for j in range(3):
        if j < m:
            idx_j = jnp.argmin(work, axis=-1)  # (B, N)
            d_j = jnp.take_along_axis(work, idx_j[..., None],
                                      axis=-1)[..., 0]
            # mask out the winner for the next sweep
            if j < 2:
                work = jnp.where(
                    jax.nn.one_hot(idx_j, m, dtype=bool), jnp.inf, work)
        else:  # fewer than 3 centers: CUDA initializer defaults
            idx_j = jnp.zeros(d2.shape[:2], jnp.int32)
            d_j = jnp.full(d2.shape[:2], 1e10, jnp.float32)
        dists.append(d_j)
        idxs.append(idx_j)
    return (jnp.stack(dists, axis=-1),
            jnp.stack(idxs, axis=-1).astype(jnp.int32))


@jax.custom_vjp
def nearest_neighbor_interpolate(points: jnp.ndarray, centers: jnp.ndarray,
                                 centers_features: jnp.ndarray) -> jnp.ndarray:
    """points (B,N,3), centers (B,M,3), centers_features (B,M,C) -> (B,N,C).

    On TPU the fused Pallas kernel runs the whole thing (distances, three
    argmin sweeps, inverse-distance-weighted one-hot matmul) per point tile
    with center features VMEM-resident; the XLA fallback below is also the
    backward (its feature-gradient transpose is the reference's scatter-add,
    neighbor_interpolate.cu:62-75)."""
    if jax.default_backend() == "tpu" and centers.shape[1] <= 2048:
        from .pallas.three_nn import three_nn_interpolate_pallas
        return three_nn_interpolate_pallas(points, centers, centers_features)
    return _nearest_neighbor_interpolate_xla(points, centers,
                                             centers_features)


def _nn_interp_fwd(points, centers, centers_features):
    return (nearest_neighbor_interpolate(points, centers, centers_features),
            (points, centers, centers_features))


def _nn_interp_bwd(res, g):
    points, centers, centers_features = res
    _, vjp = jax.vjp(
        lambda f: _nearest_neighbor_interpolate_xla(points, centers, f),
        centers_features)
    return (None, None, vjp(g)[0])


nearest_neighbor_interpolate.defvjp(_nn_interp_fwd, _nn_interp_bwd)


def _nearest_neighbor_interpolate_xla(points, centers, centers_features):
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
