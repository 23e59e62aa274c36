"""Optimizers, LR schedules, EMA (TPU-native).

Reference: utils/utils.py:115-212 `get_opt`, :1456-1481 `update_lr`,
trainers/common_fun_prior_train.py:26-90 `init_optimizer_train_2prior`,
utils/ema.py. The reference's EMA-inside-optimizer-state hack becomes a
plain pytree lerp carried in TrainState.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None
    # auxiliary non-learned state carried through the step (e.g. the
    # spectral-norm power-iteration vectors of utils/spectral_norm.py)
    sn_state: Any = None

    def apply_ema(self, new_params, decay: float):
        if self.ema_params is None:
            return None
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1.0 - decay),
            self.ema_params, new_params)


def warmup_cosine_schedule(base_lr: float, min_lr: float, warmup_iters: int,
                           total_epochs: int, warmup_epochs: int,
                           steps_per_epoch: int):
    """Linear warmup over warmup_iters steps (utils.update_lr), then cosine
    annealing stepped per epoch over (epochs - warmup_epochs - 1) epochs
    (CosineAnnealingLR in init_optimizer_train_2prior)."""
    decay_epochs = max(float(total_epochs - warmup_epochs - 1), 1.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(float(warmup_iters), 1.0)
        epoch = jnp.floor(step / steps_per_epoch) - warmup_epochs
        epoch = jnp.clip(epoch, 0.0, decay_epochs)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * epoch / decay_epochs))
        return jnp.where(step < warmup_iters, warm, cos) \
            if warmup_iters > 0 else cos

    return schedule


def make_optimizer(lr_schedule, beta1: float = 0.9, beta2: float = 0.999,
                   weight_decay: float = 0.0, grad_clip: float = -1.0,
                   eps: float = 1e-8):
    """Adam (+optional decoupled weight decay / global-norm clip), the
    reference's live path (use_adam=True in released configs)."""
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(lr_schedule, b1=beta1, b2=beta2, eps=eps,
                                 weight_decay=weight_decay))
    else:
        chain.append(optax.adam(lr_schedule, b1=beta1, b2=beta2, eps=eps))
    return optax.chain(*chain)


def create_train_state(params, optimizer, ema_decay: float = 0.0):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params)
        if ema_decay > 0 else None)


def apply_updates(state: TrainState, grads, optimizer,
                  ema_decay: float = 0.0) -> TrainState:
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.apply_ema(new_params, ema_decay) if ema_decay > 0 \
        else state.ema_params
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state, ema_params=new_ema)
