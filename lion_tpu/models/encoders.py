"""VAE encoders (Flax).

Reference:
  - PointNetPlusEncoder: models/shapelatent_modules.py:13-52 (plain pvcnn2
    SA stack, max-pool, linear -> (mu, log_sigma) of the 128-d style).
  - PointTransPVC: models/latent_points_ada.py:175-220 (AdaGN PVCNN2 U-Net
    producing per-point (pt_mu, pt_sigma, ft_mu, ft_sigma) with residual
    pt_mu = skip_weight * out + x and a sigma offset).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..nn.common import SharedMLP, TDense
from ..nn.pvconv import PVConv
from ..nn.pointnet import PointNetSAModule
from ..nn.unet import PVCNN2Unet, build_sa_stages

# sa_blocks spec: models/shapelatent_modules.py:14-17
STYLE_ENCODER_SA_BLOCKS = (
    ((32, 2, 32), (1024, 0.1, 32, (32, 32))),
    ((32, 1, 16), (256, 0.2, 32, (32, 64))),
)

# specs: models/latent_points_ada.py:177-188 (shared by encoder and decoder)
LATENT_PTS_SA_BLOCKS = (
    ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
    ((64, 3, 16), (256, 0.2, 32, (64, 128))),
    ((128, 3, 8), (64, 0.4, 32, (128, 256))),
    (None, (16, 0.8, 32, (128, 128, 128))),
)
LATENT_PTS_FP_BLOCKS = (
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 2, 16)),
    ((128, 128, 64), (64, 2, 32)),
)


class PointNetPlusEncoder(nn.Module):
    """Global style encoder: 2-stage plain SA stack + max pool + linear."""
    zdim: int
    input_dim: int = 3
    extra_feature_channels: int = 0
    dropout: float = 0.1
    vres_mult: float = 1.0
    ncenter_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x (B, N, input_dim) -> dict(mu_1d, sigma_1d) each (B, zdim)."""
        stages, _, channels_sa, _ = build_sa_stages(
            STYLE_ENCODER_SA_BLOCKS, self.extra_feature_channels,
            self.input_dim, embed_dim=0, use_att=True,
            vres_mult=self.vres_mult, ncenter_mult=self.ncenter_mult)
        features, coords = x, x
        for i, stage in enumerate(stages):
            for j, spec in enumerate(stage.convs):
                features = PVConv(
                    spec.out_channels, spec.resolution,
                    attention=spec.attention, with_se=True,
                    dropout=self.dropout, ada=False,
                    name=f"sa{i}_conv{j}")(features, coords, None, train)
            s = stage.sa
            features, coords = PointNetSAModule(
                s.num_centers, s.radius, s.num_neighbors, s.out_channels,
                ada=False, name=f"sa{i}_sa")(features, coords, None, train)
        pooled = jnp.max(features, axis=1)  # (B, C)
        out = TDense(self.zdim * 2, pooled.shape[-1], name="mlp")(pooled)
        return {"mu_1d": out[:, :self.zdim], "sigma_1d": out[:, self.zdim:]}


class PointTransPVC(nn.Module):
    """Latent-points encoder: AdaGN U-Net -> per-point posterior params."""
    zdim: int
    input_dim: int = 3
    style_dim: int = 128
    skip_weight: float = 0.1
    pts_sigma_offset: float = 0.0
    dropout: float = 0.1
    ada_mlp_init_scale: float = 1.0
    vres_mult: float = 1.0
    ncenter_mult: float = 1.0
    sa_blocks: tuple = LATENT_PTS_SA_BLOCKS
    fp_blocks: tuple = LATENT_PTS_FP_BLOCKS
    dtype: type = None

    @nn.compact
    def __call__(self, x, style, train: bool = False):
        """x (B, N, input_dim), style (B, style_dim) ->
        dict(mu_1d, sigma_1d) each (B, N*(zdim + input_dim))."""
        b, n, d = x.shape
        num_classes = 2 * self.zdim + self.input_dim * 2
        out = PVCNN2Unet(
            num_classes=num_classes, sa_blocks=self.sa_blocks,
            fp_blocks=self.fp_blocks, embed_dim=0, use_att=True,
            dropout=self.dropout, extra_feature_channels=0,
            input_dim=self.input_dim, ada=True, style_dim=self.style_dim,
            init_scale=self.ada_mlp_init_scale,
            vres_mult=self.vres_mult, ncenter_mult=self.ncenter_mult,
            dtype=self.dtype,
            name="layers")(x, style=style, train=train)  # (B, N, 2z+2d)

        pt_mu = out[..., :self.input_dim]
        pt_sigma = out[..., self.input_dim:2 * self.input_dim] \
            - self.pts_sigma_offset
        pt_mu = self.skip_weight * pt_mu + x
        if self.zdim > 0:
            ft_mu = out[..., 2 * self.input_dim:-self.zdim]
            ft_sigma = out[..., -self.zdim:]
            mu = jnp.concatenate([pt_mu, ft_mu], axis=-1).reshape(b, -1)
            sigma = jnp.concatenate([pt_sigma, ft_sigma],
                                    axis=-1).reshape(b, -1)
        else:
            mu = pt_mu.reshape(b, -1)
            sigma = pt_sigma.reshape(b, -1)
        return {"mu_1d": mu, "sigma_1d": sigma}


class LatentPointDecPVC(nn.Module):
    """Decoder: AdaGN U-Net over latent points -> (B, N, point_dim).

    Reference: models/latent_points_ada.py:222-272. `context` is the flat
    latent (B, N*(latent_dim+point_dim)); the first point_dim channels per
    point are the latent coordinates used as the residual skip."""
    point_dim: int
    context_dim: int  # latent extra-feature dim (shapelatent.latent_dim)
    num_points: int = 2048
    style_dim: int = 128
    skip_weight: float = 0.1
    dropout: float = 0.1
    ada_mlp_init_scale: float = 1.0
    vres_mult: float = 1.0
    ncenter_mult: float = 1.0
    sa_blocks: tuple = LATENT_PTS_SA_BLOCKS
    fp_blocks: tuple = LATENT_PTS_FP_BLOCKS
    dtype: type = None

    @nn.compact
    def __call__(self, context, style, train: bool = False):
        b = context.shape[0]
        per_point = self.context_dim + self.point_dim
        context = context.reshape(b, self.num_points, per_point)
        x = context[..., :self.point_dim]
        out = PVCNN2Unet(
            num_classes=self.point_dim, sa_blocks=self.sa_blocks,
            fp_blocks=self.fp_blocks, embed_dim=0, use_att=True,
            dropout=self.dropout, extra_feature_channels=self.context_dim,
            input_dim=self.point_dim, ada=True, style_dim=self.style_dim,
            init_scale=self.ada_mlp_init_scale,
            vres_mult=self.vres_mult, ncenter_mult=self.ncenter_mult,
            dtype=self.dtype,
            name="layers")(context, style=style, train=train)
        return out * self.skip_weight + x
