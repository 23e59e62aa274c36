"""Reconstruction losses (reference: utils/model_helper.py:17-102 `loss_fn`).

Reductions follow the reference exactly: *_sum variants sum over the whole
batch (returning a scalar), chamfer/emd variants are per-batch means.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.chamfer import chamfer_dist, chamfer_l1
from ..ops.emd import emd_approx


def loss_fn(pred, target, loss_type: str, point_dim: int, batch_size: int,
            loss_weight_emd: float = 0.02):
    b = batch_size
    if loss_type == "l1_sum":
        return jnp.sum(jnp.abs(pred - target))
    if loss_type == "mse_sum":
        return jnp.sum(jnp.square(pred - target))
    if loss_type == "mse":
        return jnp.mean(jnp.square(pred - target))
    if loss_type == "cd1_sum":
        dl, dr = chamfer_l1(pred, target, point_dim)
        return jnp.sum(dl) + jnp.sum(dr)
    if loss_type == "cd1_sum_emd":
        dl, dr = chamfer_l1(pred, target, point_dim)
        emd = emd_approx(pred, target) * pred.reshape(b, -1).shape[1]
        return jnp.sum(dl) + jnp.sum(dr) + jnp.sum(emd)
    if loss_type == "cd_sum":
        dl, dr = chamfer_dist(pred, target)
        return (jnp.sum(dl.reshape(b, -1), -1)
                + jnp.sum(dr.reshape(b, -1), -1))
    if loss_type == "chamfer":
        dl, dr = chamfer_dist(pred, target)
        return (jnp.mean(dl.reshape(b, -1), -1)
                + jnp.mean(dr.reshape(b, -1), -1))
    if loss_type == "l1_cd":
        l1 = jnp.sum(jnp.abs(pred - target))
        dl, dr = chamfer_dist(pred, target)
        return l1 + jnp.sum(dl) + jnp.sum(dr)
    if loss_type == "emd":
        return emd_approx(pred, target)
    if loss_type == "chamfer_emd":
        dl, dr = chamfer_dist(pred, target)
        cd = (jnp.mean(dl.reshape(b, -1), -1)
              + jnp.mean(dr.reshape(b, -1), -1))
        emd = emd_approx(pred, target)
        return cd + emd * loss_weight_emd
    raise ValueError(loss_type)


def kl_coeff(step, total_step, constant_step, min_kl_coeff,
             max_kl_coeff=1.0):
    """KL annealing schedule (reference: utils/utils.py:636-638):
    min + (max - min) * (step - constant_step) / total_step, clamped."""
    coeff = (min_kl_coeff + (max_kl_coeff - min_kl_coeff)
             * (step - constant_step) / total_step)
    return max(min(coeff, max_kl_coeff), min_kl_coeff)
