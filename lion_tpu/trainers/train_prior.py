"""Stage-2 single-prior trainer (reference: trainers/train_prior.py).

One DAE over the COMPOSED eps (style ++ latent points, vae.compose_eps);
the released LION models use the two-prior subclass, but the single-prior
path remains a supported configuration (train_prior.py:409-588 train_iter,
:703-737 build_prior).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.view import as_view
from ..diffusion.discrete import get_mixed_prediction
from ..models.registry import build_global_prior
from ..models.vae import VAE
from .optim import create_train_state
from .train_2prior import Trainer as TwoPriorTrainer


class Trainer(TwoPriorTrainer):
    """Single-prior variant: overrides the prior construction + step."""

    def build_prior(self):
        cfg = self.cfg
        super().build_prior()  # reuse optimizer/schedule/diffusion setup
        # replace the two-prior state with ONE dae over composed eps
        n = cfg.data.tr_max_sample_points
        eps_dim = cfg.latent_pts.style_dim + n * (
            cfg.shapelatent.latent_dim + cfg.ddpm.input_dim)
        # class-conditional one-hot conditioning is a 2-prior feature in
        # the reference too (train_2prior.py:241-245)
        assert not cfg.data.cond_on_cat, \
            "data.cond_on_cat requires trainer.type=trainers.train_2prior"
        from ..models.priors import GlobalPrior
        clip_on = bool(cfg.clipforge.enable)
        self.dae = GlobalPrior(
            num_input_channels=eps_dim,
            nf=cfg.sde.num_channels_dae,
            num_blocks=cfg.sde.num_cell_per_scale_dae,
            embedding_dim=cfg.sde.embedding_dim,
            embedding_type=cfg.sde.embedding_type,
            embedding_scale=cfg.sde.embedding_scale,
            dropout=cfg.sde.dropout,
            block_type="se_clip" if clip_on else "se_drop",
            mixed_prediction=bool(cfg.sde.mixed_prediction),
            mixing_logit_init=cfg.sde.mixing_logit_init,
            clip_forge_enable=clip_on,
            clip_feat_dim=cfg.clipforge.feat_dim)
        rng = jax.random.PRNGKey(cfg.trainer.seed + 2)
        init_clip = jnp.zeros((1, cfg.clipforge.feat_dim)) if clip_on \
            else None
        dae_params = jax.jit(lambda: self.dae.init(
            rng, jnp.zeros((1, eps_dim)), jnp.ones((1,)),
            clip_feat=init_clip)["params"])()
        self.state = jax.device_put(
            create_train_state({"dae": dae_params}, self.optimizer,
                               cfg.sde.ema_decay),
            self.replicated)
        if (cfg.sde.weight_decay_norm_dae > 0
                and not cfg.latent_pts.pvd_mse_loss):
            from ..utils.spectral_norm import init_sn_state
            self.state = self.state.replace(sn_state=jax.device_put(
                init_sn_state(self.state.params), self.replicated))
        self.step_fn = jax.jit(self._make_step())
        self.eps_dim = eps_dim

    def _make_step(self):
        cfg = as_view(self.cfg.to_dict())
        vae, dae = self.vae, self.dae
        diffusion = self.diffusion_cont if cfg.sde.ode_sample \
            else self.diffusion_disc
        is_cont = bool(cfg.sde.ode_sample)
        mixed = bool(cfg.sde.mixed_prediction)
        pvd_mse = bool(cfg.latent_pts.pvd_mse_loss)
        optimizer = self.optimizer
        ema_decay = cfg.sde.ema_decay
        from .optim import apply_updates
        # dae regularization (train_prior.py:495-512: SN + norm-scale + an
        # optional mixing-logit penalty, weighted-objective branch only)
        wdn_coeff = float(cfg.sde.weight_decay_norm_dae)
        reg_ml_w = float(cfg.sde.regularize_mlogit)
        reg_ml_margin = float(cfg.sde.regularize_mlogit_margin)
        use_sn = wdn_coeff > 0.0 and not pvd_mse
        use_reg_ml = reg_ml_w > 0.0 and not pvd_mse and mixed
        if use_sn:
            from ..utils.spectral_norm import (norm_scale_loss,
                                               spectral_norm_loss)

        def step_fn(state, vae_params, x, rng, clip_feat=None,
                    class_label=None):
            # class_label is accepted for train_iter signature parity but
            # rejected at build (cond_on_cat asserts in build_prior)
            del class_label
            b = x.shape[0]
            rng_enc, rng_t, rng_n, rng_d = jax.random.split(rng, 4)
            eps, _, _ = vae.apply({"params": vae_params}, x,
                                  method=VAE.encode,
                                  rngs={"sample": rng_enc})
            eps = jax.lax.stop_gradient(eps)
            if is_cont:
                t_p, var_t, m_t, obj_w, _, _ = diffusion.iw_quantities(
                    rng_t, b, cfg.sde.time_eps, cfg.sde.iw_sample_p)
            else:
                t_p, var_t, m_t, obj_w = diffusion.iw_quantities(rng_t, b)
                obj_w = obj_w[:, None] if obj_w.ndim == 1 else obj_w

            def loss_fn(params):
                noise = jax.random.normal(rng_n, eps.shape)
                eps_t = diffusion.sample_q(eps, noise, var_t, m_t)
                pred = dae.apply({"params": params["dae"]}, eps_t,
                                 t_p.astype(jnp.float32),
                                 clip_feat=clip_feat, train=True,
                                 rngs={"dropout": rng_d})
                if mixed:
                    ml = params["dae"]["mixing_logit"]
                    mix = diffusion.get_mixing_component(eps_t, t_p) \
                        if not is_cont else \
                        diffusion.mixing_component(eps_t, var_t, t_p)
                    pred = get_mixed_prediction(pred, ml, mix)
                metrics = {}
                new_sn_state = state.sn_state
                if pvd_mse:
                    p_loss = jnp.mean(jnp.square(pred - noise))
                else:
                    l2 = jnp.square(pred - noise)
                    p_loss = jnp.mean(
                        jnp.sum(obj_w * l2.reshape(b, -1), axis=1))
                    if use_sn:
                        sn, new_sn_state = spectral_norm_loss(
                            params, state.sn_state)
                        p_loss = p_loss + (sn + norm_scale_loss(params)) \
                            * wdn_coeff
                        metrics["train/dae_norm_loss"] = sn
                    if use_reg_ml:
                        ml_sum = jnp.sum(jax.nn.sigmoid(
                            params["dae"]["mixing_logit"]))
                        p_loss = p_loss + reg_ml_w * jnp.square(
                            ml_sum - reg_ml_margin)
                metrics["loss"] = p_loss
                return p_loss, (metrics, new_sn_state)

            (loss, (metrics, new_sn_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = apply_updates(state, grads, optimizer, ema_decay)
            if new_sn_state is not None:
                new_state = new_state.replace(sn_state=new_sn_state)
            return new_state, metrics

        return step_fn

    def sample(self, num_samples: int = 16, rng=None, use_ema: bool = True,
               ddim_step: int = 0):
        """Single-prior sampling: reverse diffusion over composed eps, then
        decompose + decode (train_prior.py generate_samples_vada)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = self.state.ema_params if (use_ema and
                                           self.state.ema_params is not None) \
            else self.state.params
        rng_s, rng_d = jax.random.split(rng)

        def model_fn(x, timestep):
            return self.dae.apply({"params": params["dae"]}, x,
                                  timestep.astype(jnp.float32))

        eps = self.diffusion_disc.run_denoising_diffusion(
            model_fn, rng_s, num_samples, (self.eps_dim,))
        style_dim = self.cfg.latent_pts.style_dim
        decomposed = [eps[:, :style_dim], eps[:, style_dim:]]
        return self.vae.apply({"params": self.vae_params}, num_samples,
                              decomposed_eps=decomposed, method=VAE.sample,
                              rngs={"sample": rng_d})

    def state_trees(self):
        from .hvae_trainer import _opt_state_tree
        trees = {"dae": self.state.params["dae"], "vae": self.vae_params,
                 "opt": _opt_state_tree(self.state.opt_state)}
        if self.state.ema_params is not None:
            trees["ema"] = self.state.ema_params["dae"]
        return trees

    def load_state_trees(self, trees, metadata):
        from .hvae_trainer import _opt_state_restore
        opt_state = self.state.opt_state
        if "opt" in trees:
            opt_state = _opt_state_restore(opt_state, trees["opt"])
        ema = {"dae": trees["ema"]} if "ema" in trees else None
        self.state = self.state.replace(
            params={"dae": trees["dae"]}, opt_state=opt_state,
            ema_params=ema if ema is not None else self.state.ema_params,
            step=jnp.asarray(metadata.get("step", 0), jnp.int32))
        if "vae" in trees:
            self.vae_params = jax.device_put(trees["vae"], self.replicated)
