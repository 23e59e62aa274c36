"""Wiring tests for the previously-dead knobs (VERDICT r1 weak #6/#7):
set_detect_anomaly -> jax_debug_nans, and SN/mixing-logit regularization
inside the prior train steps (reference trainers/train_prior.py:456-512,
train_2prior.py:318-326, utils/utils.py:1387-1445)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.config import get_default_cfg
from lion_tpu.config.view import as_view
from lion_tpu.models import VAE


def _reg_cfg(wdn=1e-2, reg_mlogit=0.0, bound=0):
    from tests.test_conditioning import cond_cfg
    cfg = cond_cfg()
    cfg.data.cond_on_cat = 0
    # regularization only lives on the weighted-objective branch
    # (train_2prior.py:310-326): pvd_mse_loss off, mixed prediction on
    cfg.latent_pts.pvd_mse_loss = 0
    cfg.sde.mixed_prediction = True
    cfg.sde.weight_decay_norm_dae = wdn
    cfg.sde.regularize_mlogit = reg_mlogit
    cfg.sde.regularize_mlogit_margin = 1.0
    cfg.sde.bound_mlogit = bound
    cfg.sde.bound_mlogit_value = -5.42
    return cfg


def _setup(cfg):
    from lion_tpu.diffusion.discrete import DiffusionDiscretized
    from lion_tpu.models.registry import (build_global_prior,
                                          build_local_prior)
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step
    from lion_tpu.utils.spectral_norm import init_sn_state

    vae = VAE(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3),
                    jnp.float32) * 0.1
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x)["params"]
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    gp_params = gp.init(jax.random.PRNGKey(2), jnp.zeros((1, 128)),
                        jnp.ones((1,)))["params"]
    lp_params = lp.init(jax.random.PRNGKey(3), jnp.zeros((1, 32 * 4)),
                        jnp.ones((1,)),
                        condition_input=jnp.zeros((1, 128)))["params"]
    opt = make_optimizer(warmup_cosine_schedule(1e-3, 1e-5, 0, 1, 0, 1),
                         0.9, 0.99)
    state = create_train_state({"global_prior": gp_params,
                                "local_prior": lp_params}, opt, 0.0)
    if cfg.sde.weight_decay_norm_dae > 0 and not cfg.latent_pts.pvd_mse_loss:
        state = state.replace(sn_state=init_sn_state(state.params))
    step = jax.jit(make_prior_train_step(
        vae, gp, lp, DiffusionDiscretized(cfg), opt, as_view(cfg.to_dict())))
    return state, vae_params, x, step


def test_sn_regularization_changes_loss_and_updates_state():
    cfg_on = _reg_cfg(wdn=1e-2)
    cfg_off = _reg_cfg(wdn=0.0)
    state_on, vp, x, step_on = _setup(cfg_on)
    state_off, _, _, step_off = _setup(cfg_off)

    new_on, m_on = step_on(state_on, vp, x, jax.random.PRNGKey(4))
    new_off, m_off = step_off(state_off, vp, x, jax.random.PRNGKey(4))
    assert np.isfinite(float(m_on["loss"]))
    assert "train/dae_norm_loss" in m_on
    assert float(m_on["train/dae_norm_loss"]) > 0
    # toggling the cfg weight changes the loss (the knob is live)
    assert float(m_on["loss"]) != pytest.approx(float(m_off["loss"]))
    # power-iteration state is carried and updated through the step
    assert new_on.sn_state is not None
    old_u = jax.tree_util.tree_leaves(state_on.sn_state)[0]
    new_u = jax.tree_util.tree_leaves(new_on.sn_state)[0]
    assert not np.allclose(np.asarray(old_u), np.asarray(new_u))
    assert new_off.sn_state is None


def test_regularize_mlogit_changes_loss():
    cfg_on = _reg_cfg(wdn=0.0, reg_mlogit=1e-2)
    cfg_off = _reg_cfg(wdn=0.0, reg_mlogit=0.0)
    state, vp, x, step_on = _setup(cfg_on)
    _, _, _, step_off = _setup(cfg_off)
    _, m_on = step_on(state, vp, x, jax.random.PRNGKey(4))
    _, m_off = step_off(state, vp, x, jax.random.PRNGKey(4))
    assert float(m_on["loss"]) != pytest.approx(float(m_off["loss"]))


def test_bound_mlogit_clamps():
    cfg = _reg_cfg(wdn=0.0, bound=1)
    state, vp, x, step = _setup(cfg)
    new_state, _ = step(state, vp, x, jax.random.PRNGKey(4))
    for k in ("global_prior", "local_prior"):
        ml = np.asarray(new_state.params[k]["mixing_logit"])
        assert (ml <= -5.42 + 1e-6).all()


def test_set_detect_anomaly_wires_jax_debug_nans():
    from train_dist import apply_debug_flags
    cfg = get_default_cfg()
    assert not jax.config.jax_debug_nans
    cfg.set_detect_anomaly = 0
    apply_debug_flags(cfg)
    assert not jax.config.jax_debug_nans
    cfg.set_detect_anomaly = 1
    try:
        apply_debug_flags(cfg)
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
