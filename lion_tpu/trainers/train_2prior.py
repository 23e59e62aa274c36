"""Stage-2 two-prior trainer (reference: trainers/train_2prior.py + the
shared logic of trainers/train_prior.py it subclasses).

Builds the frozen VAE (from sde.vae_checkpoint), the [global, local] prior
pair, discrete + continuous diffusion objects, dual-prior Adam + EMA, and
runs the jitted two-prior step. Sampling (generate_samples_vada_2prior,
train_2prior.py:49-127) is the same scan-based hierarchy as LION.sample.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.view import as_view
from ..diffusion.continuous import make_diffusion
from ..diffusion.discrete import DiffusionDiscretized
from ..models.registry import build_global_prior, build_local_prior
from ..models.vae import VAE
from .base import BaseTrainer
from .hvae_trainer import _opt_state_restore, _opt_state_tree
from .optim import (create_train_state, make_optimizer,
                    warmup_cosine_schedule)
from .steps import make_prior_train_step


class Trainer(BaseTrainer):
    def __init__(self, cfg, args):
        super().__init__(cfg, args)
        self.build_data()
        self.build_model()
        self.build_prior()

    # ------------------------------------------------------------- build
    def build_model(self):
        cfg = self.cfg
        self.vae = VAE(cfg)
        rng = jax.random.PRNGKey(cfg.trainer.seed)
        n = cfg.data.tr_max_sample_points
        x = jnp.zeros((1, n, cfg.ddpm.input_dim))
        self.vae_params = jax.jit(lambda: self.vae.init(
            {"params": rng, "sample": jax.random.fold_in(rng, 1)},
            x)["params"])()
        # frozen VAE weights from stage 1 (train_prior.py:247-252)
        if cfg.sde.vae_checkpoint:
            self.load_vae_checkpoint(cfg.sde.vae_checkpoint)
        self.vae_params = jax.device_put(self.vae_params, self.replicated)

    def load_vae_checkpoint(self, path: str):
        from ..ckpt.io import load_checkpoint
        if path.endswith(".pt"):
            import torch
            from ..ckpt.torch_import import import_state_dict
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in ckpt["model"].items()}
            shapes = jax.eval_shape(lambda: self.vae_params)
            self.vae_params = import_state_dict(sd, shapes, "vae")
        else:
            trees, _ = load_checkpoint(path)
            self.vae_params = trees["model"]
        self.writer.log(f"loaded VAE checkpoint from {path}")

    def build_prior(self):
        cfg = self.cfg
        self.global_prior = build_global_prior(cfg)
        self.local_prior = build_local_prior(cfg)
        self.diffusion_disc = DiffusionDiscretized(cfg)
        self.diffusion_cont = make_diffusion(as_view(cfg.to_dict()).sde)
        diffusion = self.diffusion_cont if cfg.sde.ode_sample \
            else self.diffusion_disc

        rng = jax.random.PRNGKey(cfg.trainer.seed + 1)
        n = cfg.data.tr_max_sample_points
        style_dim = cfg.latent_pts.style_dim
        local_dim = n * (cfg.shapelatent.latent_dim + cfg.ddpm.input_dim)
        gp_params = jax.jit(lambda: self.global_prior.init(
            rng, jnp.zeros((1, style_dim)), jnp.ones((1,)))["params"])()
        cond_dim = style_dim + (int(cfg.tpu.cls_emb_dim)
                                if cfg.data.cond_on_cat else 0)
        lp_params = jax.jit(lambda: self.local_prior.init(
            jax.random.fold_in(rng, 1), jnp.zeros((1, local_dim)),
            jnp.ones((1,)),
            condition_input=jnp.zeros((1, cond_dim)))["params"])()

        steps_per_epoch = max(len(self.train_loader), 1) \
            if self.train_loader else 1
        warmup_iters = steps_per_epoch * cfg.sde.warmup_epochs
        schedule = warmup_cosine_schedule(
            cfg.sde.learning_rate_dae, cfg.sde.learning_rate_min_dae,
            warmup_iters, cfg.sde.epochs, cfg.sde.warmup_epochs,
            steps_per_epoch)
        opt_cfg = cfg.trainer.opt
        self.optimizer = make_optimizer(
            schedule, opt_cfg.beta1, opt_cfg.beta2, opt_cfg.weight_decay,
            cfg.sde.grad_clip_max_norm)
        self.state = jax.device_put(
            create_train_state({"global_prior": gp_params,
                                "local_prior": lp_params},
                               self.optimizer, cfg.sde.ema_decay),
            self.replicated)
        # SN-regularization power-iteration state (train_prior.py:456-512 /
        # common_fun_prior_train.py:76-86); only live on the
        # weighted-objective branch, matching the reference
        if (cfg.sde.weight_decay_norm_dae > 0
                and not cfg.latent_pts.pvd_mse_loss):
            from ..utils.spectral_norm import init_sn_state
            self.state = self.state.replace(sn_state=jax.device_put(
                init_sn_state(self.state.params), self.replicated))
        self.step_fn = jax.jit(make_prior_train_step(
            self.vae, self.global_prior, self.local_prior, diffusion,
            self.optimizer, as_view(cfg.to_dict())))
        self.rng = jax.random.fold_in(
            jax.random.PRNGKey(cfg.trainer.seed),
            jax.process_index() + 13)

    # ------------------------------------------------------------- train
    def train_iter(self, batch, step: int) -> Dict[str, float]:
        x = self.put_batch(np.asarray(batch["tr_points"], np.float32))
        cls = None
        if self.cfg.data.cond_on_cat:
            cls = self.put_batch(np.asarray(batch["cate_idx"], np.int32))
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self.step_fn(self.state, self.vae_params, x,
                                           sub, class_label=cls)
        return {k: float(v) for k, v in metrics.items()
                if jnp.ndim(v) == 0}

    # ------------------------------------------------------------- sample
    def as_lion(self, use_ema: bool = True):
        """View this trainer's models/params as a LION inference wrapper
        (shared by sampling and the eval-only interpolation trainers)."""
        from ..models.lion import LION
        params = self.state.ema_params if (use_ema and
                                           self.state.ema_params is not None) \
            else self.state.params
        lion = LION.__new__(LION)
        lion.cfg = self.cfg
        lion.vae = self.vae
        lion.global_prior = self.global_prior
        lion.local_prior = self.local_prior
        lion.diffusion = self.diffusion_disc
        lion.num_points = self.cfg.data.tr_max_sample_points
        lion.style_dim = self.cfg.latent_pts.style_dim
        lion.local_dim = lion.num_points * (
            self.cfg.shapelatent.latent_dim + self.cfg.ddpm.input_dim)
        lion.cond_on_cat = bool(self.cfg.data.cond_on_cat)
        lion.cls_emb_dim = (int(self.cfg.tpu.cls_emb_dim)
                            if lion.cond_on_cat else 0)
        lion.cond_dim = lion.style_dim + lion.cls_emb_dim
        lion.params = {"vae": self.vae_params,
                       "global_prior": params["global_prior"],
                       "local_prior": params["local_prior"]}
        return lion

    def sample(self, num_samples: int = 16, rng=None, use_ema: bool = True,
               ddim_step: int = 0):
        """Hierarchical sampling with the (EMA) priors, as one jitted
        program (generate_samples_vada_2prior)."""
        from ..models.lion import _sample_impl
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        lion = self.as_lion(use_ema)
        full_params = lion.params
        cls = (jnp.arange(num_samples) % self.cfg.data.nclass
               if lion.cond_on_cat else None)
        if ddim_step == 0 and self.diffusion_disc.num_steps >= 500:
            # segmented scans: a single 1000-step device program can trip
            # execution watchdogs on tunneled runtimes
            lion.params = full_params
            mesh = (self.mesh if num_samples % self.mesh.devices.size == 0
                    else None)
            out = lion.sample_chunked(num_samples, rng, chunks=4,
                                      class_label=cls, mesh=mesh)
        else:
            out = _sample_impl(lion, num_samples, ddim_step, full_params,
                               rng, class_label=cls)
        return out["points"]

    def run_eval(self):
        """Sample a small set and log simple statistics; full metric eval
        goes through scripts/eval (compute_score against reference sets)."""
        pts = np.asarray(self.sample(self.cfg.num_val_samples))
        self.writer.add_scalar("eval/sample_abs_mean",
                               float(np.abs(pts).mean()), self.step)

    # ------------------------------------------------------------- ckpt
    def state_trees(self):
        trees = {
            "dae_global": self.state.params["global_prior"],
            "dae_local": self.state.params["local_prior"],
            "vae": self.vae_params,
            "opt": _opt_state_tree(self.state.opt_state),
        }
        if self.state.ema_params is not None:
            trees["ema_global"] = self.state.ema_params["global_prior"]
            trees["ema_local"] = self.state.ema_params["local_prior"]
        return trees

    def load_state_trees(self, trees, metadata):
        params = {"global_prior": trees["dae_global"],
                  "local_prior": trees["dae_local"]}
        ema = None
        if "ema_global" in trees:
            ema = {"global_prior": trees["ema_global"],
                   "local_prior": trees["ema_local"]}
        opt_state = self.state.opt_state
        if "opt" in trees:
            opt_state = _opt_state_restore(opt_state, trees["opt"])
        self.state = self.state.replace(
            params=params, opt_state=opt_state,
            ema_params=ema if ema is not None else self.state.ema_params,
            step=jnp.asarray(metadata.get("step", 0), jnp.int32))
        if "vae" in trees:
            self.vae_params = jax.device_put(trees["vae"], self.replicated)

    def export_torch(self, path: str):
        """Release-format .pt export (EMA weights, like released ckpts)."""
        from ..ckpt.io import export_torch_checkpoint
        params = self.state.ema_params or self.state.params
        export_torch_checkpoint(
            path,
            jax.tree_util.tree_map(np.asarray, self.vae_params),
            jax.tree_util.tree_map(np.asarray, params["global_prior"]),
            jax.tree_util.tree_map(np.asarray, params["local_prior"]),
            epoch=self.epoch, global_step=self.step)
