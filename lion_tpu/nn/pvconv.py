"""Point-Voxel Convolution (Flax, channels-last).

Reference: models/pvcnn2.py:170-247 / models/pvcnn2_ada.py:195-280 PVConv:
voxelize -> [Conv3d k3 -> (Ada)GN(8) -> Swish -> Dropout -> Conv3d k3 ->
(Ada)GN(8) -> (SE)] -> trilinear devoxelize -> + per-point SharedMLP ->
(LinearAttention). The voxel branch runs NDHWC so the convs hit the MXU.

Eval/sampling flow ("fused"): every elementwise pass over the R^3 grid is
folded away. Each conv runs bias-free with a per-channel input affine (+
swish) applied inside the Pallas kernel while it builds its halo, and
emits per-channel (sum, sumsq) stats of its raw output. GroupNorm/AdaGN
(and the conv bias) then become per-channel (scale, bias) vectors computed
from those stats in O(B*C) XLA math; the norm that FOLLOWS the last conv
commutes with trilinear devoxelization (interpolation weights sum to 1 and
the affine is per-channel), so it — and the SE gate, whose pooled input is
also derivable from the stats — is applied to the (B, N, C) devoxelized
points instead of the (B, R^3, C) grid. Training keeps the modular flow
(dropout + standard autodiff).
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
        import jax
        xyz = coords[..., :3]
        r = self.resolution
        k = self.kernel_size
        bsz, npts, cin = features.shape

        # megafused block (vox -> conv pair -> devox in ONE kernel): skip
        # the grid materialization entirely at the supported hot shape
        act_dt = features.dtype if self.dtype is None else jnp.dtype(
            self.dtype)
        use_block = False
        if not train and k == 3 and jax.default_backend() == "tpu" \
                and cin == self.out_channels:
            from ..ops.pallas.pvblock import supports_block_pair
            use_block = supports_block_pair(r, cin, self.out_channels, npts,
                                            jnp.dtype(act_dt).itemsize)
        if use_block:
            from ..ops.voxel import normalize_coords
            from ..ops.pallas.pvblock import pvconv_block_pair
            norm_coords = normalize_coords(xyz, r, self.normalize, self.eps)
            grid = None
        else:
            grid, norm_coords = voxelize(features, xyz, r,
                                         normalize=self.normalize,
                                         eps=self.eps)
            if self.dtype is not None:
                grid = grid.astype(self.dtype)

        conv0 = TConv3d(self.out_channels, cin, k,
                        name="vconv0", dtype=self.dtype)
        norm0 = Normalizer(self.out_channels, self.ada, self.style_dim,
                           self.init_scale, dtype=self.dtype, name="vnorm0")
        conv1 = TConv3d(self.out_channels, self.out_channels, k,
                        name="vconv1", dtype=self.dtype)
        norm1 = Normalizer(self.out_channels, self.ada, self.style_dim,
                           self.init_scale, dtype=self.dtype, name="vnorm1")
        se = SE(self.out_channels, name="se") if self.with_se else None

        if not train and k == 3:
            count = float(r ** 3)
            out_dt = features.dtype if self.dtype is None else self.dtype
            if use_block:
                k0, b0 = conv0(None, params_only=True)
                k1, b1 = conv1(None, params_only=True)
                ca0, cb0 = norm0(None, style)  # post-GN channel affine
                ca0 = jnp.broadcast_to(ca0, (bsz, cin))
                cb0 = jnp.broadcast_to(cb0, (bsz, cin))
                vox_c = jnp.round(norm_coords).astype(jnp.int32)
                pts, st1 = pvconv_block_pair(
                    features.astype(out_dt), vox_c, norm_coords,
                    k0.astype(out_dt), b0, ca0, cb0, k1.astype(out_dt), r)
                y1 = None
            else:
                from ..ops.pallas.conv3d_packed import supports_packed_pair
                if (jax.default_backend() == "tpu"
                        and cin == self.out_channels
                        and supports_packed_pair(
                            r, cin, self.out_channels,
                            jnp.dtype(act_dt).itemsize)):
                    # ONE kernel for conv0 -> AdaGN/GN -> swish -> conv1:
                    # the intermediate grid and its fold never leave VMEM
                    from ..ops.pallas.conv3d_packed import conv3d_packed_pair
                    k0, b0 = conv0(None, params_only=True)
                    k1, b1 = conv1(None, params_only=True)
                    ca0, cb0 = norm0(None, style)
                    ca0 = jnp.broadcast_to(ca0, (bsz, cin))
                    cb0 = jnp.broadcast_to(cb0, (bsz, cin))
                    xp = grid.reshape(bsz, r * r, r * cin)
                    dt = grid.dtype
                    y1p, st1 = conv3d_packed_pair(
                        xp, k0.astype(dt), b0, ca0, cb0, k1.astype(dt), r)
                    y1 = y1p.reshape(bsz, r, r, r, self.out_channels)
                else:
                    y0, st0, b0 = conv0(grid, fused=True)
                    sc0, bi0 = norm0(None, style, affine_stats=st0,
                                     count=count, conv_bias=b0)
                    y1, st1, b1 = conv1(y0, fused=True, in_affine=(sc0, bi0),
                                        pre_swish=True)
            sc1, bi1 = norm1(None, style, affine_stats=st1, count=count,
                             conv_bias=b1)
            # fold conv1 bias: h = sc1*(y1 + b1) + bi1' already handled by
            # conv_bias above -> h = sc1*y1 + bi1
            if se is not None:
                pooled = sc1 * (st1[:, 0, :] / count) + bi1    # mean of h
                gate = se(None, pooled=pooled)                 # (B, C)
                sc1 = sc1 * gate
                bi1 = bi1 * gate
            if y1 is not None:
                pts = trilinear_devoxelize(y1, norm_coords, r)  # (B, N, C)
            fused = (pts.astype(jnp.float32) * sc1[:, None, :]
                     + bi1[:, None, :]).astype(out_dt)
        else:
            h = conv0(grid)
            h = norm0(h, style)
            h = swish(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = conv1(h)
            h = norm1(h, style)
            if se is not None:
                h = se(h)
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
