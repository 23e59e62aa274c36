"""Spectral-norm regularization (reference: utils/sr_utils.py
SpectralNormCalculator + utils/utils.py:1387-1445 dae_regularization).

Functional re-design: instead of a stateful calculator that hooks torch
modules, the power-iteration vectors (u, v) live in a pytree keyed by the
param path, carried alongside the TrainState -- pure and jit-friendly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ckpt.torch_import import flatten_tree, unflatten_tree


def _as_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel -> 2D matrix (out, in*spatial), matching torch's
    weight.view(out, -1). Our channels-last kernels are (..., in, out)."""
    if w.ndim == 2:
        return w.T  # (in, out) -> (out, in)
    # conv kernel (k..., in, out) -> (out, k...*in)
    out = w.shape[-1]
    return w.reshape(-1, out).T


def init_sn_state(params) -> Dict:
    """Random-normalized u/v per kernel leaf (sr_utils.py:73-79)."""
    flat = flatten_tree(params)
    state = {}
    key = jax.random.PRNGKey(0)
    for path, w in flat.items():
        if path[-1] != "kernel":
            continue
        m = _as_matrix(jnp.asarray(w))
        key, k1, k2 = jax.random.split(key, 3)
        u = jax.random.normal(k1, (m.shape[0],))
        v = jax.random.normal(k2, (m.shape[1],))
        state[path + ("u",)] = u / jnp.maximum(jnp.linalg.norm(u), 1e-3)
        state[path + ("v",)] = v / jnp.maximum(jnp.linalg.norm(v), 1e-3)
    return unflatten_tree(state)


def spectral_norm_loss(params, sn_state, num_power_iter: int = 4
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Sum of approximate largest singular values over all kernels, plus the
    updated (stop-gradient) power-iteration state."""
    flat_p = flatten_tree(params)
    flat_s = flatten_tree(sn_state)
    loss = jnp.float32(0.0)
    new_state = {}
    for path, w in flat_p.items():
        if path[-1] != "kernel":
            continue
        m = _as_matrix(jnp.asarray(w))
        u = flat_s[path + ("u",)]
        v = flat_s[path + ("v",)]
        for _ in range(num_power_iter):
            v = m.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-3)
            u = m @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-3)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (m @ v)
        loss = loss + sigma
        new_state[path + ("u",)] = u
        new_state[path + ("v",)] = v
    return loss, unflatten_tree(new_state)


def norm_scale_loss(params) -> jnp.ndarray:
    """Sum of max |scale| over all normalization layers (the reference's
    batchnorm_loss applied to GroupNorm scales, sr_utils.py:98-104)."""
    flat = flatten_tree(params)
    loss = jnp.float32(0.0)
    for path, w in flat.items():
        if path[-1] == "scale":
            loss = loss + jnp.max(jnp.abs(jnp.asarray(w)))
    return loss
