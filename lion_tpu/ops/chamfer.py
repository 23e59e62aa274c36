"""Chamfer distance (TPU-native, batched XLA pairwise kernels).

Reference semantics (re-implemented):
  third_party/ChamferDistancePytorch/chamfer3D/chamfer3D.cu -- for each point
  the min SQUARED L2 distance to the other cloud (both directions), plus the
  argmin indices. The L1 variant used by the VAE loss (`cd1_sum`,
  utils/model_helper.py:38-41 with utils/evaluation_metrics_fast.py
  distChamferCUDA_l1) takes |dx|+|dy|+|dz| style L1 point distances.

The O(N*M) distance matrix is built from matmuls so it rides the MXU; fp32
accumulation throughout (the reference kernels are fp32-only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .points import pairwise_sqdist


def chamfer(a: jnp.ndarray, b: jnp.ndarray):
    """a (B, N, 3), b (B, M, 3) -> (dist_a (B,N), dist_b (B,M),
    idx_a (B,N), idx_b (B,M)); squared-L2 semantics."""
    d2 = pairwise_sqdist(a, b)  # (B, N, M)
    dist_a = jnp.min(d2, axis=-1)
    idx_a = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dist_b = jnp.min(d2, axis=-2)
    idx_b = jnp.argmin(d2, axis=-2).astype(jnp.int32)
    return dist_a, dist_b, idx_a, idx_b


def chamfer_dist(a: jnp.ndarray, b: jnp.ndarray):
    """Squared-L2 chamfer distances only: (B,N), (B,M)."""
    d_a, d_b, _, _ = chamfer(a, b)
    return d_a, d_b


def chamfer_l1(a: jnp.ndarray, b: jnp.ndarray, point_dim: int = 3):
    """L1-style chamfer used by the reference `cd1_sum` VAE loss.

    Matches utils/evaluation_metrics_fast.py `distChamferCUDA_l1`: nearest
    neighbor assignment by squared L2 over the first 3 coords, then L1
    distance |a - b_nn| summed over `point_dim` coords and points, per
    direction -> two (B,) losses (the reference sums over batch too; that
    reduction lives in the loss wrapper).
    """
    del point_dim  # NN always over xyz; L1 over all dims of a/b
    d2 = pairwise_sqdist(a[..., :3], b[..., :3])
    idx_a = jnp.argmin(d2, axis=-1)  # (B, N) nearest b for each a
    idx_b = jnp.argmin(d2, axis=-2)  # (B, M) nearest a for each b
    b_nn = jnp.take_along_axis(b, idx_a[:, :, None], axis=1)
    a_nn = jnp.take_along_axis(a, idx_b[:, :, None], axis=1)
    loss_a = jnp.sum(jnp.abs(a - b_nn), axis=(-1, -2))
    loss_b = jnp.sum(jnp.abs(b - a_nn), axis=(-1, -2))
    return loss_a, loss_b
