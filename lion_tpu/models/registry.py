"""Model registry: maps the reference's dotted config strings to our
modules, replacing the runtime importlib wiring (utils/model_helper.py:105-110,
train_dist.py:30) so released cfg.yml files work verbatim."""
from __future__ import annotations

from typing import Any, Callable, Dict

from .encoders import LatentPointDecPVC, PointNetPlusEncoder, PointTransPVC
from .priors import GlobalPrior, LocalPrior
from .vae import VAE

_REGISTRY: Dict[str, Any] = {
    "models.shapelatent_modules.PointNetPlusEncoder": PointNetPlusEncoder,
    "models.latent_points_ada.PointTransPVC": PointTransPVC,
    "models.latent_points_ada.LatentPointDecPVC": LatentPointDecPVC,
    "models.latent_points_ada_localprior.PVCNN2Prior": LocalPrior,
    "models.score_sde.resnet.Prior": GlobalPrior,
    "models.score_sde.resnet.PriorSEDrop": GlobalPrior,
    "models.score_sde.resnet.PriorSEClip": GlobalPrior,
    "models.vae_adain.Model": VAE,
}

_BLOCK_TYPE = {
    "models.score_sde.resnet.Prior": "plain",
    "models.score_sde.resnet.PriorSEDrop": "se_drop",
    "models.score_sde.resnet.PriorSEClip": "se_clip",
}


def import_model(model_str: str):
    if model_str not in _REGISTRY:
        raise KeyError(f"Unknown model: {model_str}; known: "
                       f"{sorted(_REGISTRY)}")
    return _REGISTRY[model_str]


def register_model(name: str, ctor):
    _REGISTRY[name] = ctor


def build_global_prior(cfg) -> GlobalPrior:
    """Build the global (style) prior from cfg.latent_pts.style_prior +
    cfg.sde (reference: models/lion.py:20-21, trainers/train_2prior.py:415+)."""
    name = cfg.latent_pts.style_prior
    block_type = _BLOCK_TYPE.get(name)
    if block_type is None:
        raise KeyError(f"Unknown global prior: {name}")
    return GlobalPrior(
        num_input_channels=cfg.latent_pts.style_dim,
        nf=cfg.sde.num_channels_dae,
        num_blocks=cfg.sde.num_cell_per_scale_dae,
        embedding_dim=cfg.sde.embedding_dim,
        embedding_type=cfg.sde.embedding_type,
        embedding_scale=cfg.sde.embedding_scale,
        dropout=cfg.sde.dropout,
        block_type=block_type,
        mixed_prediction=bool(cfg.sde.mixed_prediction),
        mixing_logit_init=cfg.sde.mixing_logit_init,
        clip_forge_enable=bool(cfg.clipforge.enable),
        clip_feat_dim=cfg.clipforge.feat_dim)


def build_local_prior(cfg) -> LocalPrior:
    name = cfg.sde.prior_model
    assert name.endswith("PVCNN2Prior"), name
    return LocalPrior(cfg=cfg)
