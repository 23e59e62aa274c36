"""Jittable train-step functions (the hot loops of the three trainers).

Reference hot loops:
  - VAE stage-1: trainers/hvae_trainer.py:90-154 `train_iter`
  - two-prior stage-2: trainers/train_2prior.py:195-410 `train_iter`

Each step here is a pure function (state, batch, rng) -> (state, metrics),
meant to be jitted with pjit/NamedShardings: batch sharded over the 'data'
mesh axis, params replicated -- XLA inserts the gradient psum that replaces
the reference's manual flattened all-reduce (utils/utils.py:717-748).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.discrete import DiffusionDiscretized, get_mixed_prediction
from ..models.vae import VAE
from ..utils.losses import kl_coeff
from .optim import TrainState, apply_updates


# ------------------------------------------------------------- stage 1
def make_vae_train_step(vae: VAE, optimizer, cfg,
                        num_total_iter: int = 0) -> Callable:
    """Returns step(state, x, rng) -> (state, metrics).

    KL annealing (vae_adain.py:219-227) runs on the traced step counter via
    the same kl_coeff formula; grad-avg across data shards falls out of the
    sharded-batch mean.
    """
    ema_decay = cfg.trainer.opt.ema_decay if cfg.ddpm.ema else 0.0
    anneal = bool(cfg.trainer.anneal_kl) and num_total_iter > 0

    def kl_weight_at(step):
        if not anneal:
            return cfg.shapelatent.kl_weight
        total = cfg.sde.kl_anneal_portion_vada * num_total_iter
        const = cfg.sde.kl_const_portion_vada * num_total_iter
        mn, mx = cfg.sde.kl_const_coeff_vada, cfg.sde.kl_max_coeff_vada
        coeff = mn + (mx - mn) * (step - const) / total
        return jnp.clip(coeff, mn, mx)

    def step_fn(state: TrainState, x, rng, class_label=None):
        rng_s, rng_d = jax.random.split(rng)
        kl_w = kl_weight_at(state.step.astype(jnp.float32))

        def loss_fn(params):
            out = vae.apply({"params": params}, x, kl_weight=kl_w,
                            class_label=class_label,
                            method=VAE.get_loss,
                            rngs={"sample": rng_s, "dropout": rng_d})
            metrics = {k: v for k, v in out.items()
                       if k.startswith(("print/", "msg/")) and
                       jnp.ndim(v) == 0}
            metrics["loss"] = out["loss"]
            return out["loss"], metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, optimizer, ema_decay)
        return new_state, metrics

    return step_fn


# ------------------------------------------------------------- stage 2
def make_prior_train_step(vae: VAE, global_prior, local_prior,
                          diffusion, optimizer, cfg) -> Callable:
    """Two-prior training step (train_2prior.py:195-410; released path:
    frozen VAE, discrete diffusion, pvd_mse_loss=1, shared t across both
    priors).

    Returns step(state, vae_params, x, rng) -> (state, metrics) where
    state.params = {'global_prior': ..., 'local_prior': ...}.
    """
    sde = cfg.sde
    ema_decay = sde.ema_decay
    mixed = bool(sde.mixed_prediction)
    pvd_mse = bool(cfg.latent_pts.pvd_mse_loss)
    is_cont = bool(sde.ode_sample)

    cond_on_cat = bool(cfg.data.cond_on_cat)

    # SN / mixing-logit regularization (utils/utils.py:1387-1445
    # dae_regularization; applied in train_2prior.py:318-326 only on the
    # weighted-objective branch, i.e. NOT when pvd_mse_loss=1, and once per
    # latent -- so the shared-calculator term enters the total loss TWICE;
    # quirk preserved). regularize_mlogit reads `dae.mixing_logit` off the
    # ModuleList upstream (an AttributeError when enabled -- broken); here it
    # sums sigmoid(mixing_logit) over both priors.
    wdn_coeff = float(sde.weight_decay_norm_dae)
    reg_mlogit_w = float(sde.regularize_mlogit)
    reg_mlogit_margin = float(sde.regularize_mlogit_margin)
    use_sn = wdn_coeff > 0.0 and not pvd_mse
    use_reg_mlogit = reg_mlogit_w > 0.0 and not pvd_mse and mixed
    bound_mlogit = bool(sde.bound_mlogit)
    bound_mlogit_value = float(sde.bound_mlogit_value)
    if use_sn:
        from ..utils.spectral_norm import norm_scale_loss, spectral_norm_loss

    # Hutchinson Jacobian / kinetic regularizers (utils/utils.py:1193-1268,
    # applied per latent inside dae_regularization, train_2prior.py:318-326
    # — weighted-objective branch only, like the SN terms). vpsde formula:
    # the probability-flow drift alpha*(v*sqrt(var_t) - J^T v), optionally
    # weighted by f_t/sqrt(var_t); jac penalizes its squared norm under
    # jac_reg_samples Gaussian probes v (J^T v via one jax.vjp pullback,
    # differentiable like torch's create_graph=True), kin penalizes the
    # drift at v = eps_t with J^T v replaced by the prediction itself.
    # Validation of the supported combination lives in
    # trainers/base.py:_validate_semantic_knobs. jac_reg_freq masks the
    # term to steps where step % freq == 0 (computed-then-masked: XLA
    # control flow cannot skip it the way eager torch does).
    jac_coeff = float(sde.jac_reg_coeff) if not pvd_mse else 0.0
    kin_coeff = float(sde.kin_reg_coeff) if not pvd_mse else 0.0
    jac_freq = max(int(sde.jac_reg_freq), 1)
    jac_samples = max(int(sde.jac_reg_samples), 1)
    jackin_drop_w = bool(sde.jac_kin_reg_drop_weights)
    use_jackin = jac_coeff > 0.0 or kin_coeff > 0.0
    if use_jackin:
        assert is_cont and mixed, \
            "validated upstream: jac/kin regs need continuous + mixed"

    def step_fn(state: TrainState, vae_params, x, rng, clip_feat=None,
                class_label=None):
        b = x.shape[0]
        if use_jackin:
            (rng_enc, rng_t, rng_n0, rng_n1, rng_d, rng_j0,
             rng_j1) = jax.random.split(rng, 7)
            rng_jac = (rng_j0, rng_j1)
        else:
            # split count kept at 5 so the regs-off noise streams are
            # byte-identical to before the port
            rng_enc, rng_t, rng_n0, rng_n1, rng_d = jax.random.split(rng, 5)
            rng_jac = (None, None)

        # frozen VAE posterior sample (compute_loss_vae with
        # train_vae=False: no_grad encode)
        eps, _, _ = vae.apply({"params": vae_params}, x, method=VAE.encode,
                              rngs={"sample": rng_enc})
        # fp32 diffusion targets even under bf16/autocast compute (torch
        # AMP computes mse_loss in fp32; same discipline here)
        eps = jax.lax.stop_gradient(eps).astype(jnp.float32)
        style_dim = cfg.latent_pts.style_dim
        eps_global, eps_local = eps[:, :style_dim], eps[:, style_dim:]

        # class-conditional: frozen-VAE class embedding joins the local
        # prior's condition (train_2prior.py:243-245,297-301; the reference's
        # global prior logs-but-ignores condition_input, resnet.py:131 — we
        # keep that asymmetry)
        cls_emb = None
        if cond_on_cat:
            assert class_label is not None, "cond_on_cat needs class_label"
            cls_emb = jax.lax.stop_gradient(vae.apply(
                {"params": vae_params}, class_label,
                method=VAE.embed_class))

        # shared t across both priors (train_2prior.py:276-279)
        if is_cont:
            t_p, var_t, m_t, obj_w, _, _ = diffusion.iw_quantities(
                rng_t, b, sde.time_eps, sde.iw_sample_p)
            timesteps = t_p  # continuous t in (0, 1]
        else:
            timesteps, var_t, m_t, obj_w = diffusion.iw_quantities(rng_t, b)
            obj_w = obj_w[:, None] if obj_w.ndim == 1 else obj_w

        def loss_fn(params):
            p_losses = []
            metrics = {}
            new_sn_state = state.sn_state
            reg_p = jnp.float32(0.0)
            if use_sn:
                sn, new_sn_state = spectral_norm_loss(params, state.sn_state)
                reg_p = reg_p + (sn + norm_scale_loss(params)) * wdn_coeff
                metrics["train/dae_norm_loss"] = sn
            if use_reg_mlogit:
                ml_sum = (jnp.sum(jax.nn.sigmoid(
                              params["global_prior"]["mixing_logit"]))
                          + jnp.sum(jax.nn.sigmoid(
                              params["local_prior"]["mixing_logit"])))
                reg_p = reg_p + reg_mlogit_w * jnp.square(
                    ml_sum - reg_mlogit_margin)
            for latent_id, (eps_i, rng_n) in enumerate(
                    [(eps_global, rng_n0), (eps_local, rng_n1)]):
                noise = jax.random.normal(rng_n, eps_i.shape)
                eps_t = diffusion.sample_q(eps_i, noise, var_t, m_t)
                if latent_id == 0:
                    def apply_prior(e):
                        return global_prior.apply(
                            {"params": params["global_prior"]}, e,
                            timesteps.astype(jnp.float32),
                            clip_feat=clip_feat,
                            train=True, rngs={"dropout": rng_d})
                else:
                    cond = eps_global  # global2style is identity
                    if cls_emb is not None:
                        cond = jnp.concatenate([eps_global, cls_emb], axis=1)

                    def apply_prior(e):
                        return local_prior.apply(
                            {"params": params["local_prior"]}, e,
                            timesteps.astype(jnp.float32),
                            condition_input=cond, clip_feat=clip_feat,
                            train=True, rngs={"dropout": rng_d})
                if use_jackin:
                    pred, vjp_fn = jax.vjp(apply_prior, eps_t)
                else:
                    pred = apply_prior(eps_t)
                # loss math in fp32 regardless of the compute dtype
                pred = pred.astype(jnp.float32)
                pred_raw = pred  # pre-mixing, as dae_regularization gets it
                if mixed:
                    ml = params["global_prior" if latent_id == 0
                                else "local_prior"]["mixing_logit"]
                    if is_cont:
                        mix = diffusion.mixing_component(eps_t, var_t,
                                                         timesteps)
                    else:
                        mix = diffusion.get_mixing_component(eps_t,
                                                             timesteps)
                    pred = get_mixed_prediction(pred, ml, mix)
                if pvd_mse:
                    p_loss = jnp.mean(jnp.square(pred - noise))
                else:
                    l2 = jnp.square(pred - noise)
                    p_obj = jnp.sum(obj_w * l2.reshape(b, -1), axis=1)
                    # per-latent regularization add (train_2prior.py:326)
                    reg_latent = reg_p
                    if use_jackin:
                        # vpsde probability-flow drift pieces
                        # (calc_{jacobian,kinetic}_regularization,
                        # utils/utils.py:1210-1217,1250-1254)
                        alpha = jax.nn.sigmoid(jax.lax.stop_gradient(ml))
                        sqrt_var = jnp.sqrt(var_t).astype(jnp.float32)
                        f_t = diffusion.f(timesteps).reshape(b, 1) \
                            .astype(jnp.float32)

                        def drift(v, jv):
                            d = alpha * (v * sqrt_var - jv)
                            if not jackin_drop_w:
                                d = f_t / sqrt_var * d
                            return d
                    if jac_coeff > 0.0:
                        sq_norms = []
                        for s in range(jac_samples):
                            probe = jax.random.normal(
                                jax.random.fold_in(rng_jac[latent_id], s),
                                eps_t.shape, jnp.float32)
                            jvp = vjp_fn(probe.astype(eps_t.dtype))[0] \
                                .astype(jnp.float32)
                            d = drift(probe, jvp)
                            sq_norms.append(jnp.sum(
                                d.reshape(b, -1) ** 2, axis=1,
                                keepdims=True))
                        jac_loss = jnp.mean(
                            jnp.concatenate(sq_norms, axis=1))
                        # jac_reg_freq: eager torch skips off-cycle steps;
                        # masked here (utils/utils.py:1395)
                        gate = (state.step % jac_freq == 0).astype(
                            jnp.float32) if jac_freq > 1 else 1.0
                        reg_latent = reg_latent + jac_coeff * gate * jac_loss
                        metrics[f"train/jac_reg_{latent_id}"] = jac_loss
                    if kin_coeff > 0.0:
                        kin_loss = jnp.mean(jnp.sum(
                            drift(eps_t.astype(jnp.float32), pred_raw)
                            .reshape(b, -1) ** 2, axis=1))
                        reg_latent = reg_latent + kin_coeff * kin_loss
                        metrics[f"train/kin_reg_{latent_id}"] = kin_loss
                    p_loss = jnp.mean(p_obj) + reg_latent
                metrics[f"train/p_loss_{latent_id}"] = p_loss
                p_losses.append(p_loss)
            total = sum(p_losses)
            metrics["loss"] = total
            return total, (metrics, new_sn_state)

        (loss, (metrics, new_sn_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, optimizer, ema_decay)
        if new_sn_state is not None:
            new_state = new_state.replace(sn_state=new_sn_state)
        if bound_mlogit and mixed:
            # clamp mixing_logit post-step (train_2prior.py:345-347)
            p = dict(new_state.params)
            for k in ("global_prior", "local_prior"):
                sub = dict(p[k])
                sub["mixing_logit"] = jnp.minimum(sub["mixing_logit"],
                                                  bound_mlogit_value)
                p[k] = sub
            new_state = new_state.replace(params=p)
        return new_state, metrics

    return step_fn
