"""PointNet++ set-abstraction / feature-propagation modules (Flax).

Reference: models/pvcnn2.py:250-376 / models/pvcnn2_ada.py:283-411.
Channels-last; FPS / ball-query / 3-NN come from lion_tpu.ops.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ..ops.points import ball_query_group, furthest_point_sample
from ..ops.interpolate import nearest_neighbor_interpolate
from .common import SharedMLP


def _as_branches(out_channels) -> Tuple[Tuple[int, ...], ...]:
    if not isinstance(out_channels, (list, tuple)):
        return ((int(out_channels),),)
    if not isinstance(out_channels[0], (list, tuple)):
        return (tuple(int(c) for c in out_channels),)
    return tuple(tuple(int(c) for c in br) for br in out_channels)


class PointNetAModule(nn.Module):
    """Aggregate-all module: MLP then global max (pvcnn2.py:250-285)."""
    out_channels: Union[int, Sequence]
    include_coordinates: bool = True
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @property
    def total_out_channels(self):
        return sum(br[-1] for br in _as_branches(self.out_channels))

    @nn.compact
    def __call__(self, features, coords, style=None):
        if self.include_coordinates:
            features = jnp.concatenate([features, coords[..., :3]], axis=-1)
        outs = []
        for i, branch in enumerate(_as_branches(self.out_channels)):
            h = SharedMLP(branch, self.ada, self.style_dim, self.init_scale,
                          dtype=self.dtype, name=f"mlp{i}")(features, style)
            outs.append(jnp.max(h, axis=1, keepdims=True))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        new_coords = jnp.zeros((coords.shape[0], 1, 3), coords.dtype)
        return out, new_coords


class PointNetSAModule(nn.Module):
    """FPS + ball-query grouping + SharedMLP + max (pvcnn2.py:288-353)."""
    num_centers: int
    radius: Union[float, Sequence[float]]
    num_neighbors: Union[int, Sequence[int]]
    out_channels: Union[int, Sequence]
    include_coordinates: bool = True
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @property
    def total_out_channels(self):
        return sum(br[-1] for br in _as_branches(self.out_channels))

    @nn.compact
    def __call__(self, features, coords, style=None, train: bool = False):
        """features (B, N, C), coords (B, N, >=3) ->
        (new_features (B, M, C'), centers (B, M, 3))."""
        xyz = coords[..., :3]
        radius = self.radius if isinstance(self.radius, (list, tuple)) \
            else [self.radius]
        num_neighbors = self.num_neighbors \
            if isinstance(self.num_neighbors, (list, tuple)) \
            else [self.num_neighbors] * len(radius)
        branches = _as_branches(self.out_channels)
        if len(branches) == 1 and len(radius) > 1:
            branches = branches * len(radius)

        centers = furthest_point_sample(xyz, self.num_centers)

        if self._fused_ok(train, features, branches, radius,
                          num_neighbors):
            out = self._fused_branch(xyz, centers, features, branches[0],
                                     radius[0], num_neighbors[0], style)
            return out, centers

        outs = []
        for i, (r, k, branch) in enumerate(zip(radius, num_neighbors,
                                               branches)):
            grouped = ball_query_group(xyz, centers, features, r, k,
                                       self.include_coordinates)
            h = SharedMLP(branch, self.ada, self.style_dim, self.init_scale,
                          dtype=self.dtype,
                          name=f"mlp{i}")(grouped, style)  # (B, M, K, C)
            outs.append(jnp.max(h, axis=2))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out, centers

    def _fused_ok(self, train, features, branches, radius, num_neighbors):
        """Single-branch eval on TPU with MLP widths the fused SA kernel
        tiles cleanly (ops/pallas/sa_fused.py)."""
        import jax
        if train or features is None or not self.include_coordinates:
            return False
        if len(branches) != 1 or len(radius) != 1:
            return False
        k = num_neighbors[0]
        if k & (k - 1) or k < 8:
            return False
        if any(c % 8 for c in branches[0]):
            return False
        if self.num_centers % 8:
            return False
        return (jax.default_backend() == "tpu"
                and self.dtype == jnp.bfloat16)

    def _fused_branch(self, xyz, centers, features, branch, r, k, style):
        """Whole SA block in one Pallas kernel: the (B, M, K, *) grouped
        tensor and MLP activations never reach HBM. The first Dense
        commutes with the gather (z1[m,j] = A[p] + B[m]); GroupNorm +
        (Ada)GN affine + swish + K-max run in-kernel. Reference
        models/pvcnn2_ada.py:323-411, bf16-level parity."""
        from ..ops.pallas.sa_fused import pointnet_sa_fused_pallas
        layers = SharedMLP(branch, self.ada, self.style_dim,
                           self.init_scale, dtype=self.dtype,
                           name="mlp0")(None, style,
                                        fold_in_features=3
                                        + features.shape[-1])
        w1, b1 = layers[0][0], layers[0][1]
        dt = self.dtype or features.dtype
        a = (jnp.concatenate([xyz, features.astype(xyz.dtype)], axis=-1)
             .astype(dt) @ w1.astype(dt)).astype(jnp.float32) + b1
        bc = -(centers.astype(dt) @ w1[:3].astype(dt)).astype(jnp.float32)
        b = xyz.shape[0]
        ws, bs, cas, cbs = [], [], [], []
        for li, (kern, bias, ca, cb) in enumerate(layers):
            cas.append(jnp.broadcast_to(ca, (b, ca.shape[-1])))
            cbs.append(jnp.broadcast_to(cb, (b, cb.shape[-1])))
            if li > 0:
                ws.append(jnp.transpose(kern))
                bs.append(bias[:, None])
        out = pointnet_sa_fused_pallas(
            xyz.astype(jnp.float32), centers.astype(jnp.float32),
            jnp.transpose(a, (0, 2, 1)), jnp.transpose(bc, (0, 2, 1)),
            tuple(ws), tuple(bs), tuple(cas), tuple(cbs), float(r), int(k))
        return jnp.transpose(out, (0, 2, 1)).astype(dt)


class PointNetFPModule(nn.Module):
    """3-NN inverse-distance interpolation + SharedMLP (pvcnn2.py:356-376)."""
    out_channels: Sequence[int]
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, points_coords, centers_coords, centers_features,
                 points_features=None, style=None):
        """points_coords (B, N, >=3), centers_coords (B, M, >=3),
        centers_features (B, M, C) -> (B, N, C')."""
        interp = nearest_neighbor_interpolate(points_coords[..., :3],
                                              centers_coords[..., :3],
                                              centers_features)
        if points_features is not None:
            interp = jnp.concatenate([interp, points_features], axis=-1)
        return SharedMLP(tuple(self.out_channels), self.ada, self.style_dim,
                         self.init_scale, dtype=self.dtype,
                         name="mlp")(interp, style)
