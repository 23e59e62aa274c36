"""Diffusion machinery: schedules, discrete DDPM/DDIM (scan-based),
continuous VPSDE + probability-flow ODE."""
from .schedules import make_beta_schedule
from .discrete import DiffusionDiscretized, get_mixed_prediction
from .continuous import DiffusionVPSDE, dopri45, make_diffusion

__all__ = ["make_beta_schedule", "DiffusionDiscretized",
           "get_mixed_prediction", "DiffusionVPSDE", "dopri45",
           "make_diffusion"]
