"""Diffusion priors (Flax).

Reference:
  - Global prior: models/score_sde/resnet.py -- a stack of
    num_cell_per_scale_dae 1x1-conv ResBlocks of width num_channels_dae with
    squeeze-excite, over the flattened style latent. 1x1 Conv2d on a
    (B, C, 1, 1) tensor is just a Dense over C, so the whole model runs as
    batched matmuls on the MXU.
  - Local prior: models/latent_points_ada_localprior.py:16-83 `PVCNN2Prior`
    -- the AdaGN PVCNN2 U-Net over the 2048x(3+latent_dim) latent points,
    conditioned on the (mapped) global sample through AdaGN style input.

Mixed prediction (`mixing_logit`, resnet.py:152-173) is carried as a flat
parameter; `get_mixed_prediction` lives in lion_tpu/diffusion.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..nn.common import (TDense, timestep_embedding,
                         RandomFourierEmbedding)
from ..nn.unet import PVCNN2Unet
from ..config.view import as_view

# local prior U-Net specs (latent_points_ada_localprior.py:17-28); note the
# third SA stage ends at 128 channels (the VAE encoder's ends at 256)
LOCAL_PRIOR_SA_BLOCKS = (
    ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
    ((64, 3, 16), (256, 0.2, 32, (64, 128))),
    ((128, 3, 8), (64, 0.4, 32, (128, 128))),
    (None, (16, 0.8, 32, (128, 128, 128))),
)
LOCAL_PRIOR_FP_BLOCKS = (
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 2, 16)),
    ((128, 128, 64), (64, 2, 32)),
)


class ResBlockSEDrop(nn.Module):
    """x+t -> dense -> relu -> dropout -> dense -> relu -> SE -> +x
    (resnet.py:60-90); channels-last over a (B, C) tensor."""
    dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        h = x + t
        h = TDense(self.dim, self.dim, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = TDense(self.dim, self.dim, name="conv2")(h)
        h = jax.nn.relu(h)
        # SE with 1x1 convs on (B, C): gate = sigmoid(fc2(relu(fc1(h))))
        g = TDense(self.dim // 8, self.dim, use_bias=False, name="se_fc1")(h)
        g = jax.nn.relu(g)
        g = TDense(self.dim, self.dim // 8, use_bias=False, name="se_fc2")(g)
        h = h * jax.nn.sigmoid(g)
        return x + h


class ResBlockSEClip(nn.Module):
    """CLIP-conditioned variant (resnet.py:29-56): t carries [temb, clip]
    stacked on channels; x+temb is concatenated with clip before conv1."""
    dim: int

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        temb, clip_feat = t[:, :self.dim], t[:, self.dim:]
        h = x + temb
        h = jnp.concatenate([h, clip_feat], axis=-1)
        h = TDense(self.dim, self.dim * 2, name="conv1")(h)
        h = jax.nn.relu(h)
        h = TDense(self.dim, self.dim, name="conv2")(h)
        h = jax.nn.relu(h)
        g = TDense(self.dim // 8, self.dim, use_bias=False, name="se_fc1")(h)
        g = jax.nn.relu(g)
        g = TDense(self.dim, self.dim // 8, use_bias=False, name="se_fc2")(g)
        h = h * jax.nn.sigmoid(g)
        return x + h


class ResBlockPlain(nn.Module):
    """ELU + GroupNorm variant (resnet.py:93-121, `Prior.building_block`)."""
    dim: int

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        h = x + t
        out = TDense(self.dim, self.dim, name="conv1")(h)
        out = nn.GroupNorm(num_groups=min(self.dim // 4, 32), epsilon=1e-6,
                           name="norm1")(out)
        out = jax.nn.elu(out)
        out = TDense(self.dim, self.dim, name="conv2")(out)
        out = nn.GroupNorm(num_groups=min(self.dim // 4, 32), epsilon=1e-6,
                           name="norm2")(out)
        out = jax.nn.elu(out)
        return h + out


class GlobalPrior(nn.Module):
    """resnet.py:124-218 `Prior` family over the flat style latent.

    block_type: 'se_drop' (PriorSEDrop, released models), 'se_clip'
    (PriorSEClip, text2shape/SVR), or 'plain' (Prior).
    """
    num_input_channels: int
    nf: int = 2048
    num_blocks: int = 8
    embedding_dim: int = 128
    embedding_type: str = "positional"
    embedding_scale: float = 1.0
    dropout: float = 0.2
    block_type: str = "se_drop"
    mixed_prediction: bool = False
    mixing_logit_init: float = -6.0
    clip_forge_enable: bool = False
    clip_feat_dim: int = 512

    @nn.compact
    def __call__(self, x, t, condition_input=None, clip_feat=None,
                 train: bool = False):
        """x (B, C) or (B, C, 1, 1); t (B,) in [1, T] -> eps pred, x's shape."""
        in_shape = x.shape
        b = x.shape[0]
        x = x.reshape(b, -1)
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (b,))

        if self.embedding_type == "positional":
            temb = timestep_embedding(t, self.embedding_dim,
                                      self.embedding_scale)
        else:
            temb = RandomFourierEmbedding(self.embedding_dim,
                                          self.embedding_scale,
                                          name="temb_fun")(t)
        # temb_layer: two stacked 1x1 convs, NO nonlinearity between
        # (resnet.py:181-184 nn.Sequential of two Conv2d)
        temb = TDense(self.embedding_dim * 4, self.embedding_dim,
                      name="temb0")(temb)
        temb = TDense(self.nf, self.embedding_dim * 4, name="temb1")(temb)

        if self.clip_forge_enable:
            assert clip_feat is not None
            cf = TDense(self.nf, self.clip_feat_dim,
                        name="clip_feat_mapping")(clip_feat)
            temb = jnp.concatenate([temb, cf], axis=-1)

        if self.mixed_prediction:
            # parameter exists for checkpoint parity; consumed by the
            # diffusion wrapper via `get_mixing_logit`
            self.param("mixing_logit",
                       lambda key, shape: jnp.full(
                           shape, self.mixing_logit_init, jnp.float32),
                       (self.num_input_channels,))

        h = TDense(self.nf, x.shape[-1], name="input_layer")(x)
        for i in range(self.num_blocks):
            if self.block_type == "se_drop":
                h = ResBlockSEDrop(self.nf, self.dropout,
                                   name=f"block{i}")(h, temb, train)
            elif self.block_type == "se_clip":
                h = ResBlockSEClip(self.nf, name=f"block{i}")(h, temb, train)
            else:
                h = ResBlockPlain(self.nf, name=f"block{i}")(
                    h, temb[:, :self.nf], train)
        out = TDense(self.num_input_channels, self.nf,
                     name="output_layer")(h)
        return out.reshape(in_shape)


class LocalPrior(nn.Module):
    """latent_points_ada_localprior.py PVCNN2Prior: U-Net over latent points
    conditioned on the global style sample."""
    cfg: Any

    @nn.compact
    def __call__(self, x, t, condition_input=None, clip_feat=None,
                 train: bool = False):
        cfg = as_view(self.cfg)
        latent_dim = cfg.shapelatent.latent_dim
        input_dim = cfg.ddpm.input_dim
        num_points = cfg.data.tr_max_sample_points
        num_classes = latent_dim + input_dim
        assert condition_input is not None, "local prior requires condition"

        from ..utils.checker import CHECKEQ
        in_shape = x.shape
        b = x.shape[0]
        CHECKEQ(int(np.prod(in_shape[1:])), num_points * num_classes)
        x = x.reshape(b, num_points, num_classes)
        style = condition_input.reshape(b, -1)

        if cfg.sde.mixed_prediction:
            self.param("mixing_logit",
                       lambda key, shape: jnp.full(
                           shape, cfg.sde.mixing_logit_init, jnp.float32),
                       (num_points * num_classes,))

        from .vae import spec_overrides
        sa_blocks, fp_blocks = LOCAL_PRIOR_SA_BLOCKS, LOCAL_PRIOR_FP_BLOCKS
        if "tpu" in cfg and (list(cfg.tpu.sa_blocks) or
                             list(cfg.tpu.fp_blocks)):
            sa_blocks, fp_blocks = spec_overrides(cfg)
        out = PVCNN2Unet(
            num_classes=num_classes,
            sa_blocks=sa_blocks,
            fp_blocks=fp_blocks,
            embed_dim=cfg.ddpm.time_dim,
            use_att=True,
            dropout=cfg.ddpm.dropout,
            extra_feature_channels=latent_dim,
            input_dim=input_dim,
            time_emb_scales=cfg.sde.embedding_scale,
            ada=True,
            # class-conditional runs widen the condition to
            # concat([eps_global, cls_emb]) (train_2prior.py:297-301)
            style_dim=cfg.latent_pts.style_dim + (
                int(cfg.tpu.cls_emb_dim)
                if (cfg.data.cond_on_cat and "tpu" in cfg) else 0),
            init_scale=cfg.latent_pts.ada_mlp_init_scale,
            clip_forge_enable=bool(cfg.clipforge.enable),
            clip_forge_dim=cfg.clipforge.feat_dim,
            vres_mult=cfg.tpu.vres_mult if "tpu" in cfg else 1.0,
            ncenter_mult=cfg.tpu.ncenter_mult if "tpu" in cfg else 1.0,
            dtype=jnp.bfloat16 if ("tpu" in cfg and cfg.tpu.bf16) else None,
            name="unet")(x, t=t, style=style, clip_feat=clip_feat,
                         train=train)
        return out.reshape(in_shape)


def get_mixing_logit(params, prior_name: str = "params"):
    """Fetch the mixing_logit parameter from a prior's param tree."""
    tree = params[prior_name] if prior_name in params else params
    return tree.get("mixing_logit", None)
