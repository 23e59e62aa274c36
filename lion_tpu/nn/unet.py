"""PVCNN2 U-Net (Flax, channels-last, spec-driven).

Reference: models/latent_points_ada.py:19-173 `PVCNN2Unet` and the factory
functions models/pvcnn2_ada.py:448-567 (`create_pointnet2_sa_components`,
`create_pointnet2_fp_modules`, `create_mlp_components`). Instead of the
reference's imperative nn.Sequential construction, the architecture is
computed up-front into declarative specs (easier to test the channel
arithmetic, and the module body stays purely functional for jit).

Preserved reference quirks (load-bearing for checkpoint parity):
  * SA stages with index c > 0 instantiate only ONE conv block regardless of
    num_blocks (pvcnn2_ada.py:484-489: only the k==0 block is appended).
  * Conv attention fires at stages where (c+1) % 2 == 0 (and p == 0).
  * FP conv blocks NEVER get attention (pvcnn2_ada.py:546 requires
    c < len(fp_blocks)-1 which is always false when p == 0).
  * The time embedding is concatenated to features at SA stages i > 0 and at
    every FP input; the first SA stage never sees it.
  * sa_in_channels[0] is overridden to the extra-feature count so the last
    FP stage sees only the non-coordinate input channels
    (latent_points_ada.py:83,153).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from .common import (LinearAttention, SharedMLP, TDense, swish,
                     timestep_embedding)
from .pvconv import PVConv
from .pointnet import PointNetAModule, PointNetFPModule, PointNetSAModule


# ---------------------------------------------------------------- specs
@dataclasses.dataclass(frozen=True)
class ConvSpec:
    out_channels: int
    resolution: Optional[int]  # None -> SharedMLP instead of PVConv
    attention: bool


@dataclasses.dataclass(frozen=True)
class SASpec:
    num_centers: Optional[int]  # None -> PointNetAModule
    radius: Union[float, Tuple[float, ...]]
    num_neighbors: Union[int, Tuple[int, ...]]
    out_channels: tuple
    concat_temb: bool  # temb concatenated directly into the SA input


@dataclasses.dataclass(frozen=True)
class SAStage:
    convs: Tuple[ConvSpec, ...]
    sa: Optional[SASpec]


@dataclasses.dataclass(frozen=True)
class FPStage:
    fp_out: Tuple[int, ...]
    convs: Tuple[ConvSpec, ...]


def build_sa_stages(sa_blocks, extra_feature_channels: int, input_dim: int = 3,
                    embed_dim: int = 64, use_att: bool = False,
                    force_att: int = 0, vres_mult: float = 1.0,
                    ncenter_mult: float = 1.0):
    """Mirror of create_pointnet2_sa_components' channel arithmetic.

    Returns (stages, sa_in_channels, channels_sa_features, num_centers).
    """
    in_channels = extra_feature_channels + input_dim
    stages, sa_in_channels = [], []
    c = 0
    num_centers = None
    extra = extra_feature_channels
    for conv_configs, sa_configs in sa_blocks:
        k = 0
        sa_in_channels.append(in_channels)
        convs = []
        if conv_configs is not None:
            out_ch, num_blocks, vres = conv_configs
            for p in range(num_blocks):
                attention = ((c + 1) % 2 == 0 and use_att and p == 0) \
                    or (bool(force_att) and c > 0)
                if c == 0 or k == 0:
                    scaled_vres = vres if vres is None else \
                        max(int(vres * vres_mult), 2)
                    convs.append(ConvSpec(out_ch, scaled_vres, attention))
                # reference quirk: for c > 0 only the first block exists
                in_channels = out_ch
                k += 1
            extra = in_channels
        sa = None
        if sa_configs is not None:
            num_centers, radius, num_neighbors, out_channels = sa_configs
            if num_centers is not None:
                num_centers = max(int(num_centers * ncenter_mult), 1)
            branches = out_channels if isinstance(out_channels[0],
                                                  (list, tuple)) \
                else [out_channels]
            total = sum(br[-1] for br in branches)
            sa = SASpec(num_centers, radius, num_neighbors,
                        tuple(tuple(br) for br in branches),
                        concat_temb=(k == 0 and embed_dim > 0))
            in_channels = extra = total
        stages.append(SAStage(tuple(convs), sa))
        c += 1
    return stages, sa_in_channels, in_channels, \
        (1 if num_centers is None else num_centers)


def build_fp_stages(fp_blocks, in_channels: int, sa_in_channels,
                    embed_dim: int = 64, vres_mult: float = 1.0):
    """Mirror of create_pointnet2_fp_modules' channel arithmetic."""
    stages = []
    for fp_idx, (fp_configs, conv_configs) in enumerate(fp_blocks):
        fp_out = tuple(fp_configs)
        in_channels = fp_out[-1]
        convs = []
        if conv_configs is not None:
            out_ch, num_blocks, vres = conv_configs
            for _ in range(num_blocks):
                scaled_vres = vres if vres is None else \
                    max(int(vres * vres_mult), 2)
                convs.append(ConvSpec(out_ch, scaled_vres, attention=False))
                in_channels = out_ch
        stages.append(FPStage(fp_out, tuple(convs)))
    return stages, in_channels


# ---------------------------------------------------------------- module
class PVCNN2Unet(nn.Module):
    """4-stage SA encoder + global LinearAttention + 4-stage FP decoder +
    classifier head, with optional sinusoidal time embedding and AdaGN style
    conditioning threaded through every block."""
    num_classes: int
    sa_blocks: tuple
    fp_blocks: tuple
    embed_dim: int = 0
    use_att: bool = True
    dropout: float = 0.1
    extra_feature_channels: int = 3
    input_dim: int = 3
    time_emb_scales: float = 1.0
    ada: bool = True
    style_dim: int = 128
    init_scale: float = 1.0
    with_se: bool = True
    clip_forge_enable: bool = False
    clip_forge_dim: int = 512
    # test-scale multipliers (reference factories' voxel_resolution_multiplier
    # concept, plus a center-count multiplier for tiny dry runs)
    vres_mult: float = 1.0
    ncenter_mult: float = 1.0
    # compute dtype: None = fp32; jnp.bfloat16 halves HBM traffic on the
    # bandwidth-bound voxel/point tensors (params stay fp32)
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, inputs, t=None, style=None, clip_feat=None,
                 train: bool = False):
        """inputs (B, N, input_dim + extra); returns (B, N, num_classes)."""
        b, n, _ = inputs.shape
        coords = inputs[..., :self.input_dim]
        features = inputs

        temb = None
        if t is not None and self.embed_dim > 0:
            t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (b,))
            emb = timestep_embedding(t, self.embed_dim, self.time_emb_scales)
            emb = TDense(self.embed_dim, self.embed_dim,
                         name="embedf0")(emb)
            emb = nn.leaky_relu(emb, negative_slope=0.1)
            temb = TDense(self.embed_dim, self.embed_dim,
                          name="embedf1")(emb)  # (B, D)

        if self.clip_forge_enable:
            assert clip_feat is not None, "clip_forge requires clip_feat"
            cf = TDense(self.embed_dim, clip_feat.shape[-1],
                        name="clip_forge_mapping")(clip_feat)
            style = jnp.concatenate([style, cf], axis=-1)
            style = TDense(self.style_dim, style.shape[-1],
                           name="style_clip")(style)

        sa_stages, sa_in_channels, channels_sa, _ = build_sa_stages(
            self.sa_blocks, self.extra_feature_channels, self.input_dim,
            self.embed_dim, self.use_att, vres_mult=self.vres_mult,
            ncenter_mult=self.ncenter_mult)

        def broadcast_temb(feat):
            if temb is None:
                return feat
            tt = jnp.broadcast_to(temb[:, None, :].astype(feat.dtype),
                                  (feat.shape[0], feat.shape[1],
                                   temb.shape[-1]))
            return jnp.concatenate([feat, tt], axis=-1)

        coords_list, in_features_list = [], []
        for i, stage in enumerate(sa_stages):
            in_features_list.append(features)
            coords_list.append(coords)
            if i > 0 and temb is not None:
                features = broadcast_temb(features)
            for j, spec in enumerate(stage.convs):
                name = f"sa{i}_conv{j}"
                if spec.resolution is None:
                    features = SharedMLP((spec.out_channels,), self.ada,
                                         self.style_dim, self.init_scale,
                                         dtype=self.dtype,
                                         name=name)(features, style)
                else:
                    features = PVConv(
                        spec.out_channels, spec.resolution,
                        attention=spec.attention, with_se=self.with_se,
                        dropout=self.dropout, ada=self.ada,
                        style_dim=self.style_dim, init_scale=self.init_scale,
                        dtype=self.dtype,
                        name=name)(features, coords, style, train)
            if stage.sa is not None:
                s = stage.sa
                if s.num_centers is None:
                    features, coords = PointNetAModule(
                        s.out_channels, ada=self.ada,
                        style_dim=self.style_dim,
                        init_scale=self.init_scale, dtype=self.dtype,
                        name=f"sa{i}_sa")(features, coords, style)
                else:
                    features, coords = PointNetSAModule(
                        s.num_centers, s.radius, s.num_neighbors,
                        s.out_channels, ada=self.ada,
                        style_dim=self.style_dim,
                        init_scale=self.init_scale, dtype=self.dtype,
                        name=f"sa{i}_sa")(features, coords, style, train)

        # only extra (non-coordinate) features feed the last FP stage
        extra_feats = inputs[..., 3:]
        in_features_list[0] = extra_feats if extra_feats.shape[-1] > 0 else None

        if self.use_att:
            features = LinearAttention(channels_sa, heads=8, dtype=self.dtype,
                                       name="global_att")(features)

        fp_stages, channels_fp = build_fp_stages(
            self.fp_blocks, channels_sa, sa_in_channels, self.embed_dim,
            vres_mult=self.vres_mult)
        for fp_idx, stage in enumerate(fp_stages):
            target_coords = coords_list[-1 - fp_idx]
            skip_feats = in_features_list[-1 - fp_idx]
            fp_in = broadcast_temb(features)
            features = PointNetFPModule(
                stage.fp_out, ada=self.ada, style_dim=self.style_dim,
                init_scale=self.init_scale, dtype=self.dtype,
                name=f"fp{fp_idx}_fp")(
                    target_coords, coords, fp_in, skip_feats, style)
            coords = target_coords
            for j, spec in enumerate(stage.convs):
                name = f"fp{fp_idx}_conv{j}"
                if spec.resolution is None:
                    features = SharedMLP((spec.out_channels,), self.ada,
                                         self.style_dim, self.init_scale,
                                         dtype=self.dtype,
                                         name=name)(features, style)
                else:
                    features = PVConv(
                        spec.out_channels, spec.resolution,
                        attention=spec.attention, with_se=self.with_se,
                        dropout=self.dropout, ada=self.ada,
                        style_dim=self.style_dim, init_scale=self.init_scale,
                        dtype=self.dtype,
                        name=name)(features, coords, style, train)

        # classifier head: SharedMLP(128) -> Dropout -> Dense(num_classes)
        # (create_mlp_components with out_channels=[128, dropout, classes])
        features = SharedMLP((128,), self.ada, self.style_dim,
                             self.init_scale, dtype=self.dtype,
                             name="cls_mlp")(features, style)
        features = nn.Dropout(self.dropout, deterministic=not train)(features)
        out = TDense(self.num_classes, features.shape[-1],
                     name="cls_out")(features)
        return out.astype(jnp.float32)
