"""Stage-1 VAE trainer (reference: trainers/hvae_trainer.py).

The reference's per-iteration body (zero_grad / get_loss / backward /
all-reduce / clip / step, :90-154) is one jitted step function; LR warmup
(update_vae_lr) is folded into the optax schedule.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.view import as_view
from ..models.vae import VAE
from .base import BaseTrainer
from .optim import (create_train_state, make_optimizer,
                    warmup_cosine_schedule)
from .steps import make_vae_train_step


class Trainer(BaseTrainer):
    def __init__(self, cfg, args):
        super().__init__(cfg, args)
        self.build_data()
        self.build_model()

    def build_model(self):
        cfg = self.cfg
        self.vae = VAE(cfg)
        steps_per_epoch = max(len(self.train_loader), 1) \
            if self.train_loader else 1
        self.num_total_iter = steps_per_epoch * cfg.trainer.epochs
        opt_cfg = cfg.trainer.opt
        warmup_iters = int(opt_cfg.vae_lr_warmup_epochs * steps_per_epoch)
        schedule = warmup_cosine_schedule(
            opt_cfg.lr, opt_cfg.lr_min, warmup_iters, cfg.trainer.epochs,
            opt_cfg.vae_lr_warmup_epochs, steps_per_epoch)
        self.optimizer = make_optimizer(
            schedule, opt_cfg.beta1, opt_cfg.beta2, opt_cfg.weight_decay,
            opt_cfg.grad_clip)

        rng = jax.random.PRNGKey(cfg.trainer.seed)
        n = cfg.data.tr_max_sample_points
        x = jnp.zeros((1, n, cfg.ddpm.input_dim))
        cls0 = (jnp.zeros((1,), jnp.int32)
                if cfg.data.cond_on_cat else None)
        params = jax.jit(lambda: self.vae.init(
            {"params": rng, "sample": jax.random.fold_in(rng, 1)},
            x, class_label=cls0)["params"])()
        ema_decay = opt_cfg.ema_decay if cfg.ddpm.ema else 0.0
        self.state = jax.device_put(
            create_train_state(params, self.optimizer, ema_decay),
            self.replicated)
        self.step_fn = jax.jit(make_vae_train_step(
            self.vae, self.optimizer, as_view(self.cfg.to_dict()),
            self.num_total_iter))
        self.rng = jax.random.fold_in(rng, jax.process_index() + 7)

    def train_iter(self, batch, step: int) -> Dict[str, float]:
        x = self.put_batch(np.asarray(batch["tr_points"], np.float32))
        cls = None
        if self.cfg.data.cond_on_cat:
            cls = self.put_batch(np.asarray(batch["cate_idx"], np.int32))
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self.step_fn(self.state, x, sub,
                                           class_label=cls)
        return {k: float(v) for k, v in metrics.items()
                if jnp.ndim(v) == 0}

    def _recont_fn(self):
        """Cached jitted reconstruction (eager flax apply dispatches
        thousands of tiny ops -- minutes per batch on CPU)."""
        if getattr(self, "_recont_jit", None) is None:
            from ..models.vae import VAE as _VAE

            @jax.jit
            def fn(params, x, rng):
                return self.vae.apply({"params": params}, x,
                                      method=_VAE.recont,
                                      rngs={"sample": rng})
            self._recont_jit = fn
        return self._recont_jit

    def eval_nll(self, num_batches: int = 0, rng=None):
        """Reconstruction CD/EMD over the test split (reference
        base_trainer.py:720-819 eval_nll; vis omitted)."""
        import numpy as np
        from ..eval import compute_nll_metric
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        recont = self._recont_fn()
        gens, refs = [], []
        for bi, batch in enumerate(self.test_loader or []):
            if num_batches and bi >= num_batches:
                break
            x = jnp.asarray(batch["tr_points"], jnp.float32)
            rng, sub = jax.random.split(rng)
            out = recont(self.state.params, x, sub)
            gens.append(np.asarray(out["x_0_pred"]))
            refs.append(np.asarray(x))
        if not gens:
            return {}
        results = compute_nll_metric(np.concatenate(gens),
                                     np.concatenate(refs))
        for k, v in results.items():
            if np.ndim(v) == 0:
                self.writer.add_scalar(f"eval/nll_{k}", float(v), self.step)
        return results

    def run_eval(self):
        """Recon-NLL eval; returns the CD score for best-ckpt tracking
        (base_trainer.py:283-290 uses the 'CD' entry of eval_nll)."""
        results = self.eval_nll(num_batches=2)
        for k, v in results.items():
            if "CD" in k and np.ndim(v) == 0:
                return float(v)
        return None

    # -------------------------------------------------------------- vis
    def vis_recont(self, batch, step: int):
        """Reconstruction grid: input vs x_0_pred on the current batch
        (base_trainer.py:327-378 vis_recont)."""
        from ..eval.eval_helper import normalize_point_clouds
        from ..utils.vis import visualize_point_clouds_3d
        x = jnp.asarray(np.asarray(batch["tr_points"], np.float32)[:4])
        out = self._recont_fn()(self.state.params, x,
                                jax.random.PRNGKey(step))
        rec = np.asarray(out["final_pred"])[:, :, :3]
        inp = np.asarray(x)[:, :, :3]
        clouds = normalize_point_clouds(
            np.concatenate([inp, rec], axis=0))
        titles = [f"inp-{i}" for i in range(len(inp))] + \
                 [f"rec-{i}" for i in range(len(rec))]
        img = visualize_point_clouds_3d(list(clouds), titles)
        self.writer.add_image("vis/recont", img, step)

    def vis_sample(self, step: int):
        """Sample grid from fresh latents (common_fun.py:17-104
        validate_inspect_noprior sample half)."""
        from ..eval.eval_helper import normalize_point_clouds
        from ..utils.vis import visualize_point_clouds_3d
        n = min(self.cfg.num_val_samples, 8)
        pts = np.asarray(self.sample(n, rng=jax.random.PRNGKey(step)))
        clouds = normalize_point_clouds(pts[:, :, :3])
        img = visualize_point_clouds_3d(
            list(clouds), [f"gen-{i}" for i in range(len(clouds))])
        self.writer.add_image("vis/sample", img, step)

    def sample(self, num_samples: int = 16, rng=None):
        """Deterministic decode of fresh latents (hvae_trainer.py:185-204)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = self.state.ema_params or self.state.params
        if getattr(self, "_sample_jit", None) is None:
            self._sample_jit = jax.jit(
                lambda p, r, n: self.vae.apply(
                    {"params": p}, n, method=VAE.sample,
                    rngs={"sample": r}),
                static_argnums=(2,))
        return self._sample_jit(params, rng, num_samples)

    def state_trees(self):
        trees = {"model": self.state.params,
                 "opt": jax.tree_util.tree_map(
                     jnp.asarray,
                     _opt_state_tree(self.state.opt_state))}
        if self.state.ema_params is not None:
            trees["ema"] = self.state.ema_params
        return trees

    def load_state_trees(self, trees, metadata):
        opt_state = self.state.opt_state
        if "opt" in trees:
            opt_state = _opt_state_restore(opt_state, trees["opt"])
        self.state = self.state.replace(
            params=trees["model"],
            opt_state=opt_state,
            ema_params=trees.get("ema", self.state.ema_params),
            step=jnp.asarray(metadata.get("step", 0), jnp.int32))


def _opt_state_tree(opt_state):
    """Flatten optax state into a plain dict tree for the npz checkpoint."""
    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    return {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}


def _opt_state_restore(template_opt_state, saved: dict):
    """Rebuild optax state from saved leaves using the live treedef."""
    treedef = jax.tree_util.tree_structure(template_opt_state)
    leaves = [saved[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
