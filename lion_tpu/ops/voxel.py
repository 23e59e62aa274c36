"""Voxelization / devoxelization ops (TPU-native).

Reference semantics (re-implemented, not translated):
  - normalize+discretize: models/pvcnn2.py:141-168 `Voxelization.forward`
    (mean-center per cloud, divide by 2*max point norm, +0.5, clamp to
    [0, r-1] after scaling by r, round to int voxel coords).
  - avg_voxelize: third_party/pvcnn/functional/src/voxelization/vox.cu:18-72
    (scatter-mean features into an r^3 grid; backward gathers grad/count --
    free with JAX autodiff of scatter-add + divide).
  - trilinear_devoxelize:
    third_party/pvcnn/functional/src/interpolate/trilinear_devox.cu:21-105
    (8-corner trilinear gather; the hi corner collapses onto lo when the
    fractional part is exactly 0, so indices never leave the grid).

Layout: channels-last. Grids are (B, R, R, R, C) so Conv3d runs as NDHWC,
the layout XLA prefers on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def normalize_coords(coords: jnp.ndarray, resolution: int,
                     normalize: bool = True, eps: float = 0.0) -> jnp.ndarray:
    """coords (B, N, 3) -> continuous voxel coords (B, N, 3) in [0, r-1].

    Mirrors models/pvcnn2.py:148-160 including the detach (coords never carry
    gradient into the voxel grid path).
    """
    coords = lax.stop_gradient(coords.astype(jnp.float32))
    centered = coords - jnp.mean(coords, axis=1, keepdims=True)
    if normalize:
        # per-point L2 norm over xyz, max over the cloud
        norm = jnp.linalg.norm(centered, axis=-1, keepdims=True)  # (B, N, 1)
        denom = jnp.max(norm, axis=1, keepdims=True) * 2.0 + eps
        normed = centered / denom + 0.5
    else:
        normed = (centered + 1.0) / 2.0
    return jnp.clip(normed * resolution, 0.0, resolution - 1)


def _avg_voxelize_single(features: jnp.ndarray, vox_idx: jnp.ndarray,
                         resolution: int) -> jnp.ndarray:
    """features (N, C), vox_idx (N,) int32 -> (r^3, C) scatter-mean.

    Sort-based: sort points by voxel id, segment-sum runs via a cumsum +
    boundary gather, then ONE unique-index scatter of at most N rows. A
    naive .at[idx].add with duplicate indices serializes on TPU and is
    several times slower at N=2048.
    """
    r3 = resolution ** 3
    n, c = features.shape
    order = jnp.argsort(vox_idx)
    sidx = jnp.take(vox_idx, order)
    sfeat = jnp.take(features, order, axis=0)

    csum = jnp.cumsum(sfeat.astype(jnp.float32), axis=0)
    ccnt = jnp.cumsum(jnp.ones((n,), jnp.float32))
    # last position of each run of equal voxel ids
    is_last = jnp.concatenate([sidx[1:] != sidx[:-1],
                               jnp.ones((1,), bool)])
    # segment totals = cumsum at run end minus cumsum at previous run end
    run_end_sum = jnp.where(is_last[:, None], csum, 0.0)
    run_end_cnt = jnp.where(is_last, ccnt, 0.0)
    # subtract the previous run's totals: gather the previous run-end values
    prev_sum = jnp.concatenate([jnp.zeros((1, c), jnp.float32), csum[:-1]])
    prev_cnt = jnp.concatenate([jnp.zeros((1,), jnp.float32), ccnt[:-1]])
    # previous run end index for each last position: scan of last-seen
    # simpler: for a run ending at i with start s, total = csum[i]-csum[s-1];
    # csum[s-1] is the csum at the PREVIOUS last position, which is the
    # maximum j < i with is_last[j]. Build via cummax of (is_last * pos).
    pos = jnp.arange(n)
    prev_last = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         lax.cummax(jnp.where(is_last, pos, -1).astype(jnp.int32))[:-1]])
    base_sum = jnp.where(prev_last[:, None] >= 0,
                         jnp.take(csum, jnp.maximum(prev_last, 0), axis=0),
                         0.0)
    base_cnt = jnp.where(prev_last >= 0,
                         jnp.take(ccnt, jnp.maximum(prev_last, 0)), 0.0)
    seg_sum = csum - base_sum          # valid at run-end rows
    seg_cnt = ccnt - base_cnt

    scatter_idx = jnp.where(is_last, sidx, r3)  # r3 = dropped
    acc = jnp.zeros((r3, c), jnp.float32).at[scatter_idx, :].set(
        seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None],
        mode="drop", unique_indices=True)
    return acc.astype(features.dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def _avg_voxelize_xla(features: jnp.ndarray, vox_coords: jnp.ndarray,
                      resolution: int) -> jnp.ndarray:
    b, n, c = features.shape
    r = resolution
    flat = (vox_coords[..., 0] * r * r + vox_coords[..., 1] * r
            + vox_coords[..., 2])
    out = jax.vmap(lambda f, i: _avg_voxelize_single(f, i, r))(features, flat)
    return out.reshape(b, r, r, r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def avg_voxelize(features: jnp.ndarray, vox_coords: jnp.ndarray,
                 resolution: int) -> jnp.ndarray:
    """features (B, N, C), vox_coords (B, N, 3) int32 -> (B, R, R, R, C).

    On TPU the forward runs the Pallas one-hot-matmul kernel (XLA scatter
    runs at ~5 GB/s); the backward replays the XLA form, whose transpose is
    the gather-of-grad/count from vox.cu:86-110.
    """
    c = features.shape[-1]
    n = features.shape[1]
    if jax.default_backend() == "tpu":
        from .pallas.voxelize_binned import (avg_voxelize_binned,
                                             binned_vox_supported)
        if binned_vox_supported(resolution, c, n):
            # r >= 32: the sorted point-binned kernel skips the ~94%-empty
            # key tiles (measured -15..26% vs dense, exp_binned_voxdevox)
            return avg_voxelize_binned(features, vox_coords, resolution)
        if ((resolution * c) % 128 == 0
                and (128 % c == 0 or c % 128 == 0)):
            from .pallas.voxelize import avg_voxelize_pallas
            return avg_voxelize_pallas(features, vox_coords, resolution)
        # lane-incompatible C (e.g. the SA2 conv0 grid at C = 128 feats
        # + 64 temb = 192): zero-pad channels up to the next multiple of
        # 128 and slice back. Exact (pad channels scatter-mean to zero)
        # and far cheaper than the XLA sort+cumsum fallback, whose
        # reduce-window cumsum alone measured ~120 us/step in the local
        # sampling chain (ARCHITECTURE section 9, round 5).
        cp = (c + 127) // 128 * 128
        if cp != c and (resolution * cp) % 128 == 0:
            fpad = jnp.concatenate(
                [features,
                 jnp.zeros(features.shape[:-1] + (cp - c,), features.dtype)],
                axis=-1)
            if binned_vox_supported(resolution, cp, n):
                grid = avg_voxelize_binned(fpad, vox_coords, resolution)
            else:
                from .pallas.voxelize import avg_voxelize_pallas
                grid = avg_voxelize_pallas(fpad, vox_coords, resolution)
            return grid[..., :c]
    return _avg_voxelize_xla(features, vox_coords, resolution)


def _avg_voxelize_fwd(features, vox_coords, resolution):
    return (avg_voxelize(features, vox_coords, resolution),
            (features, vox_coords))


def _avg_voxelize_bwd(resolution, res, g):
    features, vox_coords = res
    _, vjp = jax.vjp(lambda f: _avg_voxelize_xla(f, vox_coords, resolution),
                     features)
    return (vjp(g)[0], None)


avg_voxelize.defvjp(_avg_voxelize_fwd, _avg_voxelize_bwd)


def voxelize(features: jnp.ndarray, coords: jnp.ndarray, resolution: int,
             normalize: bool = True, eps: float = 0.0):
    """The reference Voxelization module: returns (grid, norm_coords).

    features (B, N, C), coords (B, N, 3) ->
      grid (B, R, R, R, C), norm_coords (B, N, 3) in [0, r-1] (float).
    """
    norm_coords = normalize_coords(coords, resolution, normalize, eps)
    vox_coords = jnp.round(norm_coords).astype(jnp.int32)
    if features is None:
        return None, norm_coords
    return avg_voxelize(features, vox_coords, resolution), norm_coords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_devoxelize(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                         resolution: int) -> jnp.ndarray:
    """grid (B, R, R, R, C), norm_coords (B, N, 3) float -> (B, N, C).

    Gradient flows to `grid` only (coords are stop-gradient upstream),
    matching the reference backward (trilinear_devox.cu:108+ scatter-add).
    On TPU all model resolutions (8-32) run the Pallas matmul-form kernel
    (8-corner gathers through XLA run at ~2% of HBM bandwidth): the (x, y)
    axes are contracted in one fully-packed MXU matmul per point tile, then
    z reduces on the VPU. The backward replays the XLA gather form (its
    transpose is the scatter-add).
    """
    if jax.default_backend() == "tpu":
        c = grid.shape[-1]
        n = norm_coords.shape[1]
        from .pallas.devox_binned import (binned_devox_supported,
                                          trilinear_devoxelize_binned)
        if binned_devox_supported(resolution, c, n):
            # r >= 32: sorted windowed-dot kernel (measured -8..15% vs
            # dense, exp_binned_voxdevox round 5)
            return trilinear_devoxelize_binned(grid, norm_coords,
                                               resolution)
        if resolution <= 32:
            from .pallas.devox import trilinear_devoxelize_pallas
            return trilinear_devoxelize_pallas(grid, norm_coords,
                                               resolution)
    return _trilinear_devoxelize_xla(grid, norm_coords, resolution)


def _trilinear_devox_fwd(grid, norm_coords, resolution):
    return (trilinear_devoxelize(grid, norm_coords, resolution),
            (grid, norm_coords))


def _trilinear_devox_bwd(resolution, res, g):
    grid, norm_coords = res
    _, vjp = jax.vjp(
        lambda gr: _trilinear_devoxelize_xla(gr, norm_coords, resolution),
        grid)
    return (vjp(g)[0], None)


@functools.partial(jax.jit, static_argnums=(2,))
def _trilinear_devoxelize_xla(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                              resolution: int) -> jnp.ndarray:
    r = resolution
    b = grid.shape[0]
    c = grid.shape[-1]
    coords = lax.stop_gradient(norm_coords.astype(jnp.float32))
    grid_flat = grid.reshape(b, r * r * r, c)

    lo = jnp.floor(coords)
    frac = coords - lo
    lo_i = lo.astype(jnp.int32)
    # hi collapses onto lo when frac == 0 (reference trick keeps idx in-grid)
    hi_i = lo_i + (frac > 0).astype(jnp.int32)

    out = jnp.zeros((b, coords.shape[1], c), grid.dtype)
    for dx in (0, 1):
        wx = frac[..., 0] if dx else (1.0 - frac[..., 0])
        ix = hi_i[..., 0] if dx else lo_i[..., 0]
        for dy in (0, 1):
            wy = frac[..., 1] if dy else (1.0 - frac[..., 1])
            iy = hi_i[..., 1] if dy else lo_i[..., 1]
            for dz in (0, 1):
                wz = frac[..., 2] if dz else (1.0 - frac[..., 2])
                iz = hi_i[..., 2] if dz else lo_i[..., 2]
                idx = ix * r * r + iy * r + iz  # (B, N)
                corner = jnp.take_along_axis(grid_flat, idx[:, :, None],
                                             axis=1)  # (B, N, C)
                w = (wx * wy * wz).astype(grid.dtype)
                out = out + corner * w[:, :, None]
    return out


trilinear_devoxelize.defvjp(_trilinear_devox_fwd, _trilinear_devox_bwd)
