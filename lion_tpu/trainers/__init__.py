"""Trainers. The registry maps the reference's cfg.trainer.type dotted
strings (train_dist.py:30 importlib wiring) to our trainer classes."""
from .optim import (TrainState, apply_updates, create_train_state,
                    make_optimizer, warmup_cosine_schedule)
from .steps import make_prior_train_step, make_vae_train_step


def get_trainer(trainer_type: str):
    if trainer_type.endswith("hvae_trainer"):
        from .hvae_trainer import Trainer
        return Trainer
    if trainer_type.endswith("train_2prior"):
        from .train_2prior import Trainer
        return Trainer
    if trainer_type.endswith("train_prior"):
        from .train_prior import Trainer
        return Trainer
    if trainer_type.endswith("interpolate_latent"):
        from .interpolate import InterpolateLatentTrainer
        return InterpolateLatentTrainer
    if trainer_type.endswith("encode_interp_interp"):
        from .interpolate import EncodeInterpTrainer
        return EncodeInterpTrainer
    raise KeyError(f"unknown trainer type: {trainer_type}")


__all__ = ["TrainState", "apply_updates", "create_train_state",
           "make_optimizer", "warmup_cosine_schedule",
           "make_prior_train_step", "make_vae_train_step", "get_trainer"]
