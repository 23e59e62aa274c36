"""Point sampling / grouping ops (TPU-native).

Reference semantics (re-implemented, not translated):
  - furthest_point_sample: third_party/pvcnn/functional/src/sampling/sampling.cu:86-167
    (always seeds index 0; iteratively picks argmax of running min-distance).
  - ball_query: third_party/pvcnn/functional/src/ball_query/ball_query.cu:19-50
    (first <=K points within radius in index order; empty -> all index 0;
    partial -> padded with the FIRST found neighbor).
  - grouping: third_party/pvcnn/functional/src/grouping/grouping.cu:18-36
    (batched gather; backward = scatter-add, free with JAX autodiff).

Layout: this framework is channels-last everywhere -- coords are (B, N, 3)
and features (B, N, C) (the reference uses (B, 3, N)); last dim maps to TPU
lanes and matmuls contract the channel dim on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# furthest point sampling
# --------------------------------------------------------------------------
def _fps_single(coords: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """coords: (N, 3) float32 -> (num_samples,) int32 indices."""
    n = coords.shape[0]
    coords = coords.astype(jnp.float32)

    def body(i, state):
        min_d2, idxs, last = state
        last_xyz = jnp.take(coords, last, axis=0)
        d2 = jnp.sum(jnp.square(coords - last_xyz[None, :]), axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_d2, idxs, nxt

    init_d2 = jnp.full((n,), jnp.inf, dtype=jnp.float32)
    idxs = jnp.zeros((num_samples,), dtype=jnp.int32)  # index 0 pre-seeded
    _, idxs, _ = lax.fori_loop(1, num_samples, body,
                               (init_d2, idxs, jnp.int32(0)))
    return idxs


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample_idx(coords: jnp.ndarray,
                              num_samples: int) -> jnp.ndarray:
    """coords: (B, N, 3) -> (B, num_samples) int32 indices.

    Inherently sequential over num_samples (each pick depends on the last).
    On TPU a Pallas kernel runs the whole chain in VMEM (one kernel launch);
    elsewhere it is a fori_loop with a full-N min-distance update per step.

    Index outputs carry no gradient (the reference FPS is forward-only,
    sampling.cu); inputs are stop-gradiented so autodiff never tries to
    linearize the Pallas kernel.
    """
    coords = lax.stop_gradient(coords)
    if jax.default_backend() == "tpu" and num_samples > 1:
        from .pallas.fps import furthest_point_sample_idx_pallas
        return furthest_point_sample_idx_pallas(coords, num_samples)
    return jax.vmap(lambda c: _fps_single(c, num_samples))(coords)


def furthest_point_sample(coords: jnp.ndarray,
                          num_samples: int) -> jnp.ndarray:
    """coords: (B, N, 3) -> sampled centers (B, num_samples, 3).

    On TPU the Pallas kernel emits the picked coords directly (exact
    fp32, extracted by the same masked maxes that drive the distance
    update); the XLA row gather it replaces measured ~84 us at
    B16/N2048/M1024 vs ~1 us for the transpose."""
    coords = lax.stop_gradient(coords)
    if jax.default_backend() == "tpu" and num_samples > 1:
        from .pallas.fps import furthest_point_sample_pallas
        _, ctr_t = furthest_point_sample_pallas(coords, num_samples)
        return jnp.transpose(ctr_t, (1, 2, 0))
    idx = furthest_point_sample_idx(coords, num_samples)
    return jnp.take_along_axis(coords, idx[:, :, None], axis=1)


# --------------------------------------------------------------------------
# ball query
# --------------------------------------------------------------------------
def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., M, D), (..., N, D) -> (..., M, N) squared L2, MXU-friendly."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(jnp.square(a), axis=-1)[..., :, None]
    b2 = jnp.sum(jnp.square(b), axis=-1)[..., None, :]
    # HIGHEST precision: fp32 inputs must not be truncated to bf16 on the MXU
    # (the reference distance kernels are exact fp32).
    ab = jnp.einsum("...md,...nd->...mn", a, b,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def pairwise_sqdist_exact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact (subtract-square-sum) form, matching the CUDA kernels bit-for-bit
    up to reduction order. Needed where a hard radius threshold makes the
    matmul form's cancellation error observable (ball query). XLA fuses the
    broadcast so the (M, N, D) intermediate is never materialized."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(jnp.square(diff), axis=-1)


@functools.partial(jax.jit, static_argnums=(3,))
def ball_query(centers: jnp.ndarray, points: jnp.ndarray, radius: float,
               num_neighbors: int) -> jnp.ndarray:
    """centers (B, M, 3), points (B, N, 3) -> (B, M, K) int32 indices.

    CUDA pad semantics (ball_query.cu:19-50): the first K in-radius points
    in INDEX order; empty -> all zeros; partial -> repeat the first hit.

    Implemented as a top_k over order keys (masked-out points get key
    N + index), which vectorizes on TPU -- the first K masked indices are
    exactly the K smallest keys. The earlier per-row cumsum+scatter form
    lowered to 16k serialized scatters (~160ms at B=16); this is ~100x
    faster.
    """
    n = points.shape[1]
    k = num_neighbors
    m = centers.shape[1]
    # int index output: gradient-free (stop autodiff from linearizing the
    # Pallas kernel when this appears inside a differentiated subgraph)
    centers = lax.stop_gradient(centers)
    points = lax.stop_gradient(points)
    if jax.default_backend() == "tpu" and m % min(m, 256) == 0:
        from .pallas.ball_query import ball_query_pallas
        return ball_query_pallas(centers, points, radius, num_neighbors)
    d2 = pairwise_sqdist_exact(centers, points)  # (B, M, N)
    mask = d2 < jnp.float32(radius) ** 2
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    key = jnp.where(mask, iota, iota + n)
    neg_topk, _ = lax.top_k(-key, k)  # (B, M, K) smallest keys, ascending
    kth = -neg_topk
    valid = kth < n
    idx = jnp.where(valid, kth, 0)
    first = idx[..., 0:1]
    # pad partial rows with the first hit (zero rows stay zero)
    return jnp.where(valid, idx, jnp.broadcast_to(first, idx.shape)) \
        .astype(jnp.int32)


# --------------------------------------------------------------------------
# grouping / gather
# --------------------------------------------------------------------------
def grouping(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), indices (B, M, K) -> (B, M, K, C)."""
    b, n, c = features.shape
    _, m, k = indices.shape
    flat_idx = indices.reshape(b, m * k)
    out = jnp.take_along_axis(features, flat_idx[:, :, None], axis=1)
    return out.reshape(b, m, k, c)


def gather(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), indices (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(features, indices[:, :, None], axis=1)


# --------------------------------------------------------------------------
# ball-query + grouping fused convenience (reference BallQuery module fwd,
# models/pvcnn2.py:82-115)
# --------------------------------------------------------------------------
def _ball_query_group_xla(points_coords, centers_coords, points_features,
                          radius, num_neighbors, include_coordinates):
    idx = ball_query(centers_coords, points_coords, radius, num_neighbors)
    neighbor_coords = grouping(points_coords, idx)
    neighbor_coords = neighbor_coords - centers_coords[:, :, None, :]
    if points_features is None:
        assert include_coordinates, "No features for grouping"
        return neighbor_coords
    neighbor_feats = grouping(points_features, idx)
    if include_coordinates:
        # concat in the FEATURES dtype: jnp promotion would widen a bf16
        # features path to fp32 here while the Pallas fast path emits the
        # features dtype — the custom_vjp's backward replay then sees a
        # different output dtype than the forward (r4: broke the bf16
        # full-scale train step)
        neighbor_feats = jnp.concatenate(
            [neighbor_coords.astype(points_features.dtype), neighbor_feats],
            axis=-1)
    return neighbor_feats


def _ball_query_group_impl(points_coords, centers_coords, points_features,
                           radius, num_neighbors, include_coordinates):
    m = centers_coords.shape[1]
    n = points_coords.shape[1]
    c = 0 if points_features is None else points_features.shape[2]
    out_dt = points_coords.dtype if points_features is None \
        else points_features.dtype
    if jax.default_backend() == "tpu" and m % min(m, 128) == 0 \
            and include_coordinates:
        from .pallas.ball_query_group import (ball_query_group_pallas,
                                              ball_query_group_row_fits)
        if ball_query_group_row_fits(m, n, num_neighbors, c,
                                     jnp.dtype(out_dt).itemsize):
            return ball_query_group_pallas(points_coords, centers_coords,
                                           points_features, radius,
                                           num_neighbors,
                                           include_coordinates)
    return _ball_query_group_xla(points_coords, centers_coords,
                                 points_features, radius, num_neighbors,
                                 include_coordinates)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ball_query_group(points_coords: jnp.ndarray, centers_coords: jnp.ndarray,
                     points_features, radius: float,
                     num_neighbors: int,
                     include_coordinates: bool = True) -> jnp.ndarray:
    """Returns neighbor features (B, M, K, C(+3)); coords are center-relative.

    On TPU the forward runs as ONE fused Pallas kernel (selection one-hots
    contracted against the feature table on the MXU -- XLA gathers of short
    rows run at a few GB/s); the backward replays the XLA formulation
    (gather transpose = scatter-add, exactly the reference grouping.cu
    backward)."""
    return _ball_query_group_impl(points_coords, centers_coords,
                                  points_features, radius, num_neighbors,
                                  include_coordinates)


def _bqg_fwd(points_coords, centers_coords, points_features, radius,
             num_neighbors, include_coordinates):
    out = _ball_query_group_impl(points_coords, centers_coords,
                                 points_features, radius, num_neighbors,
                                 include_coordinates)
    return out, (points_coords, centers_coords, points_features)


def _bqg_bwd(radius, num_neighbors, include_coordinates, res, g):
    points_coords, centers_coords, points_features = res
    if points_features is None:
        _, vjp = jax.vjp(
            lambda pc, cc: _ball_query_group_xla(
                pc, cc, None, radius, num_neighbors, include_coordinates),
            points_coords, centers_coords)
        gpc, gcc = vjp(g)
        return gpc, gcc, None
    _, vjp = jax.vjp(
        lambda pc, cc, pf: _ball_query_group_xla(
            pc, cc, pf, radius, num_neighbors, include_coordinates),
        points_coords, centers_coords, points_features)
    return vjp(g)


ball_query_group.defvjp(_bqg_fwd, _bqg_bwd)


# --------------------------------------------------------------------------
# channel-first fused ball-query + grouping: (B, K, 3+C, M) output for the
# channel-first SharedMLP path (MXU-friendly on both the gather matmul and
# the MLP matmuls; see pallas/ball_query_group.py ball_query_group_cf_pallas)
# --------------------------------------------------------------------------
def _ball_query_group_cf_impl(points_coords, centers_coords,
                              points_features, radius, num_neighbors):
    m = centers_coords.shape[1]
    k = num_neighbors
    if (jax.default_backend() == "tpu" and k & (k - 1) == 0
            and m % min(m, 8) == 0):
        from .pallas.ball_query_group import ball_query_group_cf_pallas
        return ball_query_group_cf_pallas(points_coords, centers_coords,
                                          points_features, radius,
                                          num_neighbors)
    out = _ball_query_group_xla(points_coords, centers_coords,
                                points_features, radius, num_neighbors,
                                True)
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ball_query_group_cf(points_coords: jnp.ndarray,
                        centers_coords: jnp.ndarray, points_features,
                        radius: float, num_neighbors: int) -> jnp.ndarray:
    """Channel-first ball_query_group: (B, K, 3+C, M), rows =
    [center-relative xyz ++ features]. Same semantics as
    ball_query_group(..., include_coordinates=True) transposed
    (0, 2, 3, 1)."""
    return _ball_query_group_cf_impl(points_coords, centers_coords,
                                     points_features, radius,
                                     num_neighbors)


def _bqg_cf_fwd(points_coords, centers_coords, points_features, radius,
                num_neighbors):
    out = _ball_query_group_cf_impl(points_coords, centers_coords,
                                    points_features, radius, num_neighbors)
    return out, (points_coords, centers_coords, points_features)


def _bqg_cf_bwd(radius, num_neighbors, res, g):
    points_coords, centers_coords, points_features = res
    _, vjp = jax.vjp(
        lambda pc, cc, pf: jnp.transpose(
            _ball_query_group_xla(pc, cc, pf, radius, num_neighbors, True),
            (0, 2, 3, 1)),
        points_coords, centers_coords, points_features)
    return vjp(g)


ball_query_group_cf.defvjp(_bqg_cf_fwd, _bqg_cf_bwd)
