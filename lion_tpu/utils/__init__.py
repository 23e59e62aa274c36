"""Utilities: losses, writer, spectral norm, vis, checkers, exp helpers."""
from .losses import kl_coeff, loss_fn
from .writer import AvgMeter, Writer
from .exp_helper import ExpTimer, get_evalname, get_expname, hash_config
from . import checker

__all__ = ["kl_coeff", "loss_fn", "AvgMeter", "Writer", "ExpTimer",
           "get_evalname", "get_expname", "hash_config", "checker"]
