"""Hierarchical VAE (reference: models/vae_adain.py `Model`).

Two-level latent: a 128-d global "style" latent from PointNetPlusEncoder and
a structured per-point latent (2048 x (3+latent_dim)) from the AdaGN U-Net,
decoded back by another AdaGN U-Net.

Functional flax design: stochastic methods draw from the 'sample' RNG
collection; training code calls
  model.apply(params, x, method=VAE.recont, rngs={'sample': k, 'dropout': k2})
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .distributions import Normal
from .encoders import (LATENT_PTS_FP_BLOCKS, LATENT_PTS_SA_BLOCKS,
                       LatentPointDecPVC, PointNetPlusEncoder, PointTransPVC)
from ..utils.losses import loss_fn
from ..config.view import as_view


def _deep_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(_deep_tuple(v) for v in x)
    return x


def spec_overrides(cfg):
    """cfg.tpu.{sa,fp}_blocks overrides (empty -> reference specs)."""
    sa, fp = LATENT_PTS_SA_BLOCKS, LATENT_PTS_FP_BLOCKS
    if "tpu" in cfg:
        raw_sa = list(cfg.tpu.sa_blocks) if "sa_blocks" in cfg.tpu else []
        raw_fp = list(cfg.tpu.fp_blocks) if "fp_blocks" in cfg.tpu else []
        if raw_sa:
            sa = _deep_tuple(raw_sa)
        if raw_fp:
            fp = _deep_tuple(raw_fp)
    return sa, fp


class VAE(nn.Module):
    """cfg-driven hierarchical VAE. `cfg` is the full config tree."""
    cfg: Any

    def setup(self):
        cfg = as_view(self.cfg)
        self.input_dim = cfg.ddpm.input_dim
        self.latent_dim = cfg.shapelatent.latent_dim
        self.num_points = cfg.data.tr_max_sample_points
        self.style_dim = cfg.latent_pts.style_dim
        self.kl_weight = cfg.shapelatent.kl_weight
        self.log_sigma_offset = cfg.shapelatent.log_sigma_offset

        vres_mult = cfg.tpu.vres_mult if "tpu" in cfg else 1.0
        ncenter_mult = cfg.tpu.ncenter_mult if "tpu" in cfg else 1.0
        dtype = jnp.bfloat16 if ("tpu" in cfg and cfg.tpu.bf16) else None
        sa_blocks, fp_blocks = spec_overrides(cfg)

        # class-conditional path (data.cond_on_cat). The reference intends a
        # `class_embedding` lookup but never defines it (vae_adain.py:66 —
        # broken upstream); here: one-hot @ W embedding (== nn.Embedding),
        # conditioning the DECODER style via concat([z_global, cls_emb])
        # (the reachable usage, vae_adain.py:167). Encoder-side conditioning
        # (the `enc_input = x, cls_emb` tuple) is dead code upstream and is
        # deliberately not reproduced.
        self.cond_on_cat = bool(cfg.data.cond_on_cat)
        self.cls_emb_dim = (int(cfg.tpu.cls_emb_dim)
                            if ("tpu" in cfg and "cls_emb_dim" in cfg.tpu)
                            else 64)
        dec_style_dim = self.style_dim
        if self.cond_on_cat:
            self.nclass = int(cfg.data.nclass)
            self.class_embedding = nn.Dense(self.cls_emb_dim, use_bias=False,
                                            name="class_embedding")
            dec_style_dim = self.style_dim + self.cls_emb_dim
        assert cfg.latent_pts.style_encoder.endswith("PointNetPlusEncoder"), \
            cfg.latent_pts.style_encoder
        self.style_encoder = PointNetPlusEncoder(
            zdim=self.style_dim, input_dim=self.input_dim,
            dropout=cfg.ddpm.dropout,
            vres_mult=vres_mult, ncenter_mult=ncenter_mult)
        assert cfg.latent_pts.style_mlp in ("",), (
            "style_mlp variants not implemented; released configs use ''")
        assert cfg.shapelatent.encoder_type.endswith("PointTransPVC"), \
            cfg.shapelatent.encoder_type
        self.encoder = PointTransPVC(
            zdim=self.latent_dim, input_dim=self.input_dim,
            style_dim=self.style_dim,
            skip_weight=cfg.latent_pts.skip_weight,
            pts_sigma_offset=cfg.latent_pts.pts_sigma_offset,
            dropout=cfg.ddpm.dropout,
            ada_mlp_init_scale=cfg.latent_pts.ada_mlp_init_scale,
            vres_mult=vres_mult, ncenter_mult=ncenter_mult,
            sa_blocks=sa_blocks, fp_blocks=fp_blocks, dtype=dtype)
        assert cfg.shapelatent.decoder_type.endswith("LatentPointDecPVC"), \
            cfg.shapelatent.decoder_type
        self.decoder = LatentPointDecPVC(
            point_dim=self.input_dim, context_dim=self.latent_dim,
            num_points=self.num_points, style_dim=dec_style_dim,
            skip_weight=cfg.latent_pts.skip_weight,
            dropout=cfg.ddpm.dropout,
            ada_mlp_init_scale=cfg.latent_pts.ada_mlp_init_scale,
            vres_mult=vres_mult, ncenter_mult=ncenter_mult,
            sa_blocks=sa_blocks, fp_blocks=fp_blocks, dtype=dtype)

    # -- latent bookkeeping (vae_adain.py:97-103,335-339) -----------------
    def latent_shape(self):
        return [
            [self.style_dim, 1, 1],
            [self.num_points * (self.latent_dim + self.input_dim), 1, 1],
        ]

    def compose_eps(self, all_eps):
        return jnp.concatenate([e.reshape(e.shape[0], -1) for e in all_eps],
                               axis=1)

    def decompose_eps(self, all_eps):
        eps = all_eps.reshape(all_eps.shape[0], -1)
        return [eps[:, :self.style_dim], eps[:, self.style_dim:]]

    def global2style(self, style):
        """vae_adain.py:120-127; with style_mlp == '' this is identity
        (modulo 4d squeeze handled by callers)."""
        return style.reshape(style.shape[0], -1)

    def embed_class(self, class_label):
        """class_label: (B,) int indices or (B, nclass) one-hot floats ->
        (B, cls_emb_dim). One-hot @ W == nn.Embedding lookup (the layer the
        reference forgot to define; train_2prior.py:241-245 feeds one-hot)."""
        assert self.cond_on_cat, "embed_class requires data.cond_on_cat"
        class_label = jnp.asarray(class_label)
        if class_label.ndim == 1:
            class_label = jax.nn.one_hot(class_label, self.nclass)
        return self.class_embedding(class_label.astype(jnp.float32))

    def _dec_style(self, z_global, cls_emb):
        """Decoder conditioning: concat([z_global, cls_emb]) when
        class-conditional (vae_adain.py:167), else raw z_global
        (vae_adain.py:328-331 quirk preserved)."""
        if self.cond_on_cat:
            assert cls_emb is not None, "cond_on_cat needs class input"
            return jnp.concatenate([z_global, cls_emb], axis=1)
        return z_global

    # -- core passes ------------------------------------------------------
    def encode(self, x, train: bool = False):
        """x (B, N, D) -> (all_eps (B, Dg+Dl), all_log_q, latent_list)."""
        from ..utils.checker import CHECK3D, CHECKDIM
        CHECK3D(x)
        CHECKDIM(x, 2, self.input_dim)
        z = self.style_encoder(x, train=train)
        dist_global = Normal(mu=z["mu_1d"], log_sigma=z["sigma_1d"])
        z_global, _ = dist_global.sample(self.make_rng("sample"))

        style = z_global
        z = self.encoder(x, style, train=train)
        sigma_local = z["sigma_1d"] - self.log_sigma_offset
        dist_local = Normal(mu=z["mu_1d"], log_sigma=sigma_local)
        z_local, _ = dist_local.sample(self.make_rng("sample"))

        all_eps = self.compose_eps([z_global, z_local])
        all_log_q = [dist_global.log_p(z_global), dist_local.log_p(z_local)]
        latent_list = [
            (z_global, dist_global.mu, dist_global.log_sigma),
            (z_local, dist_local.mu, dist_local.log_sigma),
        ]
        return all_eps, all_log_q, latent_list

    def recont(self, x, target=None, class_label=None, train: bool = False):
        """Full reconstruction pass (vae_adain.py:137-207)."""
        x_0_target = x if target is None else target
        all_eps, all_log_q, latent_list = self.encode(x, train=train)
        z_global = latent_list[0][0]
        z_local = latent_list[1][0]
        cls_emb = (self.embed_class(class_label)
                   if self.cond_on_cat else None)
        style = self._dec_style(z_global, cls_emb)
        x_0_pred = self.decoder(z_local, style, train=train)
        if cls_emb is not None:
            return {
                "cls_emb": cls_emb,
                "all_eps": all_eps,
                "all_log_q": all_log_q,
                "latent_list": latent_list,
                "x_0_pred": x_0_pred,
                "x_0_target": x_0_target,
                "final_pred": x_0_pred,
            }
        return {
            "all_eps": all_eps,
            "all_log_q": all_log_q,
            "latent_list": latent_list,
            "x_0_pred": x_0_pred,
            "x_0_target": x_0_target,
            "final_pred": x_0_pred,
        }

    def get_loss(self, x, kl_weight: Optional[float] = None,
                 noisy_input=None, class_label=None, train: bool = True):
        """ELBO with per-group weighted KL (vae_adain.py:209-296).

        kl annealing lives in the trainer; pass the annealed kl_weight in.
        """
        cfg = as_view(self.cfg)
        if kl_weight is None:
            kl_weight = self.kl_weight
        batch_size = x.shape[0]
        inputs = noisy_input if noisy_input is not None else x
        output = self.recont(inputs, target=x, class_label=class_label,
                             train=train)

        loss_0 = jnp.mean(loss_fn(
            output["x_0_pred"], output["x_0_target"], cfg.ddpm.loss_type,
            self.input_dim, batch_size,
            loss_weight_emd=cfg.ddpm.loss_weight_emd))
        output["rec_loss"] = loss_0
        output["print/loss_0"] = loss_0

        weighted_kl_terms = []
        kl_term_list = []
        for pairs_id, (cz, cmu, clog_sigma) in enumerate(
                output["latent_list"]):
            kl_close = Normal(cmu, clog_sigma).kl_to_standard()
            kl_close = kl_close.reshape(batch_size, -1)
            if pairs_id == 1:
                per_point = self.latent_dim + self.input_dim
                kl3 = kl_close.reshape(batch_size, -1, per_point)
                kl_pt = jnp.sum(kl3[..., :self.input_dim], axis=(1, 2))
                kl_feat = jnp.sum(kl3[..., self.input_dim:], axis=(1, 2))
                weighted_kl_terms.append(
                    kl_pt * cfg.latent_pts.weight_kl_pt)
                weighted_kl_terms.append(
                    kl_feat * cfg.latent_pts.weight_kl_feat)
                output["print/kl_pt"] = jnp.mean(kl_pt)
                output["print/kl_feat"] = jnp.mean(kl_feat)
            else:
                kl_style = jnp.sum(kl_close, axis=-1)
                weighted_kl_terms.append(
                    kl_style * cfg.latent_pts.weight_kl_glb)
                output["print/kl_glb"] = jnp.mean(kl_style)
            kl_term_list.append(jnp.sum(kl_close, axis=-1))

        kl = kl_weight * sum(weighted_kl_terms)
        loss = jnp.mean(kl) + loss_0 * cfg.weight_recont
        output["msg/kl"] = jnp.mean(kl)
        output["msg/rec"] = loss_0
        output["print/kl_weight"] = kl_weight
        output["loss"] = loss
        return output

    def sample(self, num_samples: int = 10, decomposed_eps=(),
               class_label=None, train: bool = False):
        """Decode given (or fresh) latents -> (B, N, D).

        Preserves the reference quirk (vae_adain.py:328-331): the decoder is
        conditioned on the RAW z_global (style_mlp is '' in released
        configs, so this equals the styled path).
        """
        latent_shape = (num_samples,
                        self.num_points * (self.latent_dim + self.input_dim))
        style_shape = (num_samples, self.style_dim)
        if len(decomposed_eps) == 0:
            z_global = jax.random.normal(self.make_rng("sample"), style_shape)
            z_local = jax.random.normal(self.make_rng("sample"), latent_shape)
        else:
            z_global = decomposed_eps[0].reshape(style_shape)
            z_local = decomposed_eps[1].reshape(latent_shape)
        cls_emb = (self.embed_class(class_label)
                   if self.cond_on_cat else None)
        style = self._dec_style(z_global, cls_emb)
        return self.decoder(z_local, style, train=train)

    def __call__(self, x, class_label=None, train: bool = False):
        """Init-friendly entry: a full reconstruction pass."""
        return self.recont(x, class_label=class_label, train=train)
