"""Reconstruction losses (reference: utils/model_helper.py:17-102 `loss_fn`).

Reductions follow the reference exactly: *_sum variants sum over the whole
batch (returning a scalar), chamfer/emd variants are per-batch means.
"""
from __future__ import annotations

import jax
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


def kl_balancer_coeff(num_scales: int, groups_per_scale, fun: str = "square"):
    """Per-group KL balancing coefficients (reference utils/utils.py:547-568,
    `kl_balancer_coeff`): deeper scales get larger alpha, normalized so the
    minimum is 1. Returns a (sum(groups),) float32 array."""
    import numpy as np
    parts = []
    for i in range(num_scales):
        g = groups_per_scale[num_scales - i - 1]
        if fun == "equal":
            parts.append(np.ones(g))
        elif fun == "linear":
            parts.append((2.0 ** i) * np.ones(g))
        elif fun == "sqrt":
            parts.append(np.sqrt(2.0 ** i) * np.ones(g))
        elif fun == "square":
            parts.append(np.square(2.0 ** i) / g * np.ones(g))
        else:
            raise NotImplementedError(fun)
    coeff = np.concatenate(parts).astype(np.float32)
    return jnp.asarray(coeff / coeff.min())


def kl_per_group(kl_all):
    """(B, G) -> ((1, G) smoothed per-group |KL| means, (G,) means)
    (reference utils/utils.py:571-576)."""
    kl_vals = jnp.mean(kl_all, axis=0)
    kl_coeff_i = jnp.mean(jnp.abs(kl_all), axis=0, keepdims=True) + 0.01
    return kl_coeff_i, kl_vals


def kl_balancer(kl_all, kl_coeff: float = 1.0, kl_balance: bool = False,
                alpha_i=None):
    """Group-balanced KL (reference utils/utils.py:593-615).

    kl_all: list of per-group (B,) KL terms. When kl_balance and
    kl_coeff < 1 (annealing phase), each group's weight is proportional to
    its recent |KL| divided by alpha_i, renormalized to mean 1; the weights
    are stop-gradient (the reference detaches). Returns
    (kl (B,) scaled by kl_coeff, kl_coeffs (G,), kl_vals (G,))."""
    kl_stack = jnp.stack(list(kl_all), axis=1)                 # (B, G)
    if kl_balance and kl_coeff < 1.0:
        assert alpha_i is not None
        alpha = alpha_i.reshape(1, -1)
        kl_coeff_i, kl_vals = kl_per_group(kl_stack)
        total_kl = jnp.sum(kl_coeff_i)
        kl_coeff_i = kl_coeff_i / alpha * total_kl
        kl_coeff_i = kl_coeff_i / jnp.mean(kl_coeff_i, axis=1,
                                           keepdims=True)
        kl = jnp.sum(kl_stack * jax.lax.stop_gradient(kl_coeff_i), axis=1)
        kl_coeffs = kl_coeff_i[0]
    else:
        kl_vals = jnp.mean(kl_stack, axis=0)
        kl = jnp.sum(kl_stack, axis=1)
        kl_coeffs = jnp.ones((kl_stack.shape[1],), jnp.float32)
    return kl_coeff * kl, kl_coeffs, kl_vals
