"""Point-Voxel Convolution (Flax, channels-last).

Reference: models/pvcnn2.py:170-247 / models/pvcnn2_ada.py:195-280 PVConv:
voxelize -> [Conv3d k3 -> (Ada)GN(8) -> Swish -> Dropout -> Conv3d k3 ->
(Ada)GN(8) -> (SE)] -> trilinear devoxelize -> + per-point SharedMLP ->
(LinearAttention). The voxel branch runs NDHWC so XLA keeps the Conv3d on
the MXU; the point branch is a Dense over channels.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.voxel import voxelize, trilinear_devoxelize
from .common import (SE, LinearAttention, Normalizer, SharedMLP,
                     TConv3d, swish)


class PVConv(nn.Module):
    out_channels: int
    resolution: int
    kernel_size: int = 3
    attention: bool = False
    with_se: bool = True
    add_point_feat: bool = True
    dropout: float = 0.1
    normalize: bool = True
    eps: float = 0.0
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, features, coords, style=None, train: bool = False):
        """features (B, N, C_in), coords (B, N, >=3) -> (B, N, C_out)."""
        xyz = coords[..., :3]
        r = self.resolution
        grid, norm_coords = voxelize(features, xyz, r,
                                     normalize=self.normalize, eps=self.eps)
        if self.dtype is not None:
            grid = grid.astype(self.dtype)

        k = self.kernel_size
        h = TConv3d(self.out_channels, grid.shape[-1], k,
                    name="vconv0", dtype=self.dtype)(grid)
        h = Normalizer(self.out_channels, self.ada, self.style_dim,
                       self.init_scale, dtype=self.dtype,
                       name="vnorm0")(h, style)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = TConv3d(self.out_channels, self.out_channels, k,
                    name="vconv1", dtype=self.dtype)(h)
        h = Normalizer(self.out_channels, self.ada, self.style_dim,
                       self.init_scale, dtype=self.dtype,
                       name="vnorm1")(h, style)
        if self.with_se:
            h = SE(self.out_channels, name="se")(h)

        fused = trilinear_devoxelize(h, norm_coords, r)
        if self.add_point_feat:
            fused = fused + SharedMLP((self.out_channels,), self.ada,
                                      self.style_dim, self.init_scale,
                                      dtype=self.dtype,
                                      name="point_features")(features, style)
        if self.attention:
            fused = LinearAttention(self.out_channels, dtype=self.dtype,
                                    name="attn")(fused)
        return fused
