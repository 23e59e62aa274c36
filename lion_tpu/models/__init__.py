"""Model layer: VAE, priors, LION API, registry."""
from .distributions import Normal
from .encoders import LatentPointDecPVC, PointNetPlusEncoder, PointTransPVC
from .priors import GlobalPrior, LocalPrior
from .vae import VAE
from .registry import (build_global_prior, build_local_prior, import_model,
                       register_model)
from .lion import LION

__all__ = ["Normal", "LatentPointDecPVC", "PointNetPlusEncoder",
           "PointTransPVC", "GlobalPrior", "LocalPrior", "VAE",
           "build_global_prior", "build_local_prior", "import_model",
           "register_model", "LION"]
