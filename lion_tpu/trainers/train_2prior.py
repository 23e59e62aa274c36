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


# Sentinel returned by eval_sample on EVERY process when no reference set
# exists: distinguishes "nothing to score anywhere" (callers may issue
# fallback device programs collectively) from "rank>0, rank 0 scored"
# (callers must NOT issue extra programs — multi-host hang).
NO_REFS = object()


def _ensure_csv(save_dir: str) -> str:
    d = os.path.join(save_dir, "results")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "eval_out.csv")


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
        # ClipForge: per-batch CLIP features condition both priors
        # (train_2prior.py:248-258); host-side encoder, see clip_helper
        self.clip_encoder = None
        cf0 = None
        if cfg.clipforge.enable:
            import os as _os
            from ..utils.clip_helper import get_clip_encoder
            # LION_REQUIRE_CLIP=1 turns the silent HashClip fallback into a
            # hard failure (production clipforge runs should set it)
            require = _os.environ.get("LION_REQUIRE_CLIP", "0") == "1"
            self.clip_encoder = get_clip_encoder(
                cfg.clipforge.clip_model, normalize=False,
                allow_fallback=not require)
            if not self.clip_encoder.is_real:
                self.writer.log("WARNING: CLIP weights unavailable; using "
                                "HashClip pseudo-features (clipforge). Set "
                                "LION_CLIP_MODEL to a local weight dir or "
                                "LION_REQUIRE_CLIP=1 to fail instead")
            cf0 = jnp.zeros((1, cfg.clipforge.feat_dim))
        gp_params = jax.jit(lambda: self.global_prior.init(
            rng, jnp.zeros((1, style_dim)), jnp.ones((1,)),
            clip_feat=cf0)["params"])()
        cond_dim = style_dim + (int(cfg.tpu.cls_emb_dim)
                                if cfg.data.cond_on_cat else 0)
        lp_params = jax.jit(lambda: self.local_prior.init(
            jax.random.fold_in(rng, 1), jnp.zeros((1, local_dim)),
            jnp.ones((1,)),
            condition_input=jnp.zeros((1, cond_dim)),
            clip_feat=cf0)["params"])()

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
    def _batch_clip_feat(self, batch) -> Optional[np.ndarray]:
        """Per-batch CLIP image features: encode the (B, nimg, H, W, 3)
        render views and mean-pool over views (train_2prior.py:248-258)."""
        tr_img = batch.get("tr_img")
        if tr_img is None or self.clip_encoder is None:
            if self.cfg.clipforge.enable:
                assert tr_img is not None, \
                    "clipforge.enable needs data.clip_forge_enable render " \
                    "images in the batch"
            return None
        b, nimg = tr_img.shape[:2]
        flat = tr_img.reshape(b * nimg, *tr_img.shape[2:])
        feat = self.clip_encoder.encode_image(flat)
        return feat.reshape(b, nimg, -1).mean(axis=1).astype(np.float32)

    def train_iter(self, batch, step: int) -> Dict[str, float]:
        x = self.put_batch(np.asarray(batch["tr_points"], np.float32))
        cls = None
        if self.cfg.data.cond_on_cat:
            cls = self.put_batch(np.asarray(batch["cate_idx"], np.int32))
        clip_feat = self._batch_clip_feat(batch)
        if clip_feat is not None:
            clip_feat = self.put_batch(clip_feat)
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self.step_fn(self.state, self.vae_params, x,
                                           sub, clip_feat=clip_feat,
                                           class_label=cls)
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

    def _test_clip_feat(self, num: int) -> Optional[np.ndarray]:
        """CLIP features for eval/vis sampling, from the first test-split
        render images (base_trainer.py:646-709 prepare_vis_data clip part),
        tiled/truncated to `num` rows."""
        if self.clip_encoder is None:
            return None
        if getattr(self, "_clip_feat_test", None) is None:
            for batch in (self.test_loader or []):
                feat = self._batch_clip_feat(batch)
                if feat is None:
                    return None
                self._clip_feat_test = feat
                break
            else:
                return None
        feat = self._clip_feat_test
        reps = (num + len(feat) - 1) // len(feat)
        return np.tile(feat, (reps, 1))[:num]

    def sample(self, num_samples: int = 16, rng=None, use_ema: bool = True,
               ddim_step: int = 0, clip_feat=None, local: bool = False):
        """Hierarchical sampling with the (EMA) priors, as one jitted
        program (generate_samples_vada_2prior). local=True forces an
        unsharded per-process program (required for paths that may run on
        a subset of processes, e.g. training-time vis)."""
        from ..models.lion import _sample_impl
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        lion = self.as_lion(use_ema)
        full_params = lion.params
        cls = (jnp.arange(num_samples) % self.cfg.data.nclass
               if lion.cond_on_cat else None)
        if clip_feat is None and self.cfg.clipforge.enable:
            clip_feat = self._test_clip_feat(num_samples)
        if clip_feat is not None:
            clip_feat = jnp.asarray(clip_feat)
        if (ddim_step == 0 and self.diffusion_disc.num_steps >= 500
                and not self.cfg.sde.ode_sample):
            # segmented scans: a single 1000-step device program can trip
            # execution watchdogs on tunneled runtimes. ODE sampling
            # (sde.ode_sample=1) runs through _sample_impl's RK45 branch.
            lion.params = full_params
            mesh = (self.mesh if (not local and num_samples
                                  % self.mesh.devices.size == 0)
                    else None)
            out = lion.sample_chunked(num_samples, rng, chunks=4,
                                      clip_feat=clip_feat,
                                      class_label=cls, mesh=mesh)
        else:
            out = _sample_impl(lion, num_samples, ddim_step, full_params,
                               rng, clip_feat=clip_feat, class_label=cls)
        return out["points"]

    def run_eval(self):
        """In-training sample-metric eval (base_trainer.py:380-561
        eval_sample, sized down to cfg.num_val_samples per val_freq):
        generate vs the test split, run the metric suite, log test/* and
        CSV, return 1-NNA-CD for best-checkpoint tracking.

        Multi-host discipline: eval_sample returns NO_REFS identically on
        EVERY process (the ref-availability decision is broadcast), so the
        fallback sampling below is issued by all processes together; a
        plain None means "rank>0 participated, rank 0 scored" and must NOT
        trigger extra device programs."""
        n = max(int(self.cfg.num_val_samples), 2)
        results = self.eval_sample(self.step, num_gen=n,
                                   metric2=None, save_samples=False)
        if results is NO_REFS:
            # no test refs anywhere: fall back to a sanity statistic
            # (all processes sample; only rank 0 logs)
            pts = np.asarray(self.sample(n))
            self.writer.add_scalar("eval/sample_abs_mean",
                                   float(np.abs(pts).mean()), self.step)
            return None
        if results is None:
            return None
        return float(results["1-NN-CD-acc"])

    def _test_refs(self, num: int):
        """Collect `num` reference clouds + their training-set stats from
        the test split (the denorm trap: eval_helper.py:257-266 applies
        REF per-item (m, s) to both gen and ref rows)."""
        refs, ms, ss = [], [], []
        got = 0
        for batch in (self.test_loader or []):
            refs.append(np.asarray(batch["tr_points"], np.float32))
            ms.append(np.asarray(batch["mean"], np.float32))
            ss.append(np.asarray(batch["std"], np.float32))
            got += refs[-1].shape[0]
            if got >= num:
                break
        if not refs:
            return None, None, None
        refs = np.concatenate(refs)[:num]
        m = np.concatenate(ms)[:num].reshape(num, 1, -1)
        s = np.concatenate(ss)[:num].reshape(num, 1, -1)
        return refs, m, s

    def _load_refs(self, num_gen: int):
        """Reference set for scoring: released ref .pt when present, else
        the test split. Returns (ref_pcs, m, s) or None (rank 0 only)."""
        from ..eval import get_cats, get_ref_pt
        cfg = self.cfg
        cats = get_cats(cfg.data.cates)
        ref_path = get_ref_pt(cats, cfg.data.type)
        if ref_path and os.path.exists(ref_path):
            import torch
            ref = torch.load(ref_path, map_location="cpu",
                             weights_only=False)
            ref_pcs = np.asarray(ref["ref"], np.float32)[:num_gen, :, :3]
            m = np.asarray(ref["mean"], np.float32)[:num_gen]
            s = np.asarray(ref["std"], np.float32)[:num_gen]
            m = m.reshape(len(ref_pcs), 1, -1)
            s = s.reshape(len(ref_pcs), 1, -1)
            return ref_pcs, m, s
        ref_pcs, m, s = self._test_refs(num_gen)
        if ref_pcs is None:
            return None
        return ref_pcs, m, s

    def eval_sample(self, step: int = 0, num_gen: int = 0,
                    metric2: Optional[str] = "EMD",
                    save_samples: bool = True):
        """Generate-and-score eval (base_trainer.py:380-561): per-iteration
        reseed seed+i, cross-process all_gather, rank-0 scoring against the
        reference registry when a ref .pt exists, else the test split.
        Returns the metric dict (rank 0), None (rank>0, scoring happened on
        rank 0), or the NO_REFS sentinel on EVERY process when no reference
        set exists anywhere."""
        from ..eval import (compute_all_metrics, get_cats, get_ref_num,
                            jsd_between_point_cloud_sets)
        from ..eval.eval_helper import print_results, write_results
        cfg = self.cfg
        cats = get_cats(cfg.data.cates)
        if num_gen <= 0:
            try:
                num_gen = cfg.num_ref or get_ref_num(cats)
            except AssertionError:
                num_gen = cfg.data.batch_size_test
        batch = min(cfg.data.batch_size_test, num_gen)
        nproc = jax.process_count()
        per_proc = (num_gen + nproc - 1) // nproc

        gen_pcs, seed = [], cfg.trainer.seed
        for i in range(0, per_proc, batch):
            nb = min(batch, per_proc - i)
            # per-iteration reseed, offset by process for distinct streams
            # (base_trainer.py:459-463)
            rng = jax.random.PRNGKey(seed + i + jax.process_index() * 7919)
            pts = self.sample(nb, rng=rng, ddim_step=cfg.eval_ddim_step)
            gen_pcs.append(np.asarray(pts)[:, :, :3])
        gen_pcs = np.concatenate(gen_pcs)
        if nproc > 1:
            # eval-time gather of generated clouds (base_trainer.py:480-487)
            from jax.experimental import multihost_utils
            gen_pcs = np.asarray(
                multihost_utils.process_allgather(gen_pcs))
            gen_pcs = gen_pcs.reshape(-1, *gen_pcs.shape[-2:])
        gen_pcs = gen_pcs[:num_gen]

        # Reference availability must be decided IDENTICALLY on every
        # process (rank 0 decides, result broadcast): callers use the
        # NO_REFS return to issue fallback device programs collectively.
        refs = None
        if jax.process_index() == 0:
            refs = self._load_refs(num_gen)
        if nproc > 1:
            from jax.experimental import multihost_utils
            has_refs = bool(np.asarray(multihost_utils.broadcast_one_to_all(
                np.asarray(refs is not None, np.int32))))
        else:
            has_refs = refs is not None
        if not has_refs:
            return NO_REFS
        if jax.process_index() != 0:
            return None
        ref_pcs, m, s = refs

        if save_samples:
            out_name = os.path.join(cfg.save_dir, f"samples_{step}.pt")
            try:
                import torch
                torch.save(torch.from_numpy(gen_pcs), out_name)
            except Exception:
                out_name = out_name.replace(".pt", ".npz")
                np.savez(out_name, ref=gen_pcs)
            self.writer.log(f"saved {gen_pcs.shape} samples to {out_name}")

        norm_box = bool(cfg.data.recenter_per_shape
                        or cfg.data.normalize_shape_box)
        n = min(len(ref_pcs), len(gen_pcs))
        ref_pcs, gen_pcs, m, s = ref_pcs[:n], gen_pcs[:n], m[:n], s[:n]
        if norm_box:
            from ..eval.eval_helper import normalize_point_clouds
            ref_pcs = 0.5 * normalize_point_clouds(ref_pcs)
            gen_pcs = 0.5 * normalize_point_clouds(gen_pcs)
        else:
            ref_pcs = ref_pcs * s + m
            gen_pcs = gen_pcs * s + m

        results = compute_all_metrics(gen_pcs.astype(np.float32),
                                      ref_pcs.astype(np.float32),
                                      batch_size=min(64, n),
                                      metric2=metric2)
        results["jsd"] = jsd_between_point_cloud_sets(gen_pcs, ref_pcs)
        # scalar logging (base_trainer.py:540-548)
        tag_map = {"lgan_cov-CD": "test/Coverage_CD",
                   "lgan_cov-EMD": "test/Coverage_EMD",
                   "lgan_mmd-CD": "test/MMD_CD",
                   "lgan_mmd-EMD": "test/MMD_EMD",
                   "1-NN-CD-acc": "test/1NN_CD",
                   "1-NN-EMD-acc": "test/1NN_EMD",
                   "jsd": "test/JSD"}
        for k, tag in tag_map.items():
            if k in results:
                self.writer.add_scalar(tag, float(results[k]), step)
        kwargs = {"dataset": cats, "hash": cfg.hash,
                  "step": "%dk" % (step / 1000.0),
                  "epoch": "%.1fk" % (self.epoch / 1000.0)}
        msg = print_results(results, **kwargs)
        with open(os.path.join(cfg.save_dir, "eval_out.txt"), "a") as f:
            f.write(msg + "\n")
        write_results(_ensure_csv(cfg.save_dir), results, **kwargs)
        return results

    # -------------------------------------------------------------- vis
    def vis_sample(self, step: int):
        """Training-time sample grid (common_fun_prior_train.py:93-267
        validate_inspect): few-step DDIM keeps the cadence cheap."""
        from ..eval.eval_helper import normalize_point_clouds
        from ..utils.vis import visualize_point_clouds_3d
        n = min(self.cfg.num_val_samples, 8)
        ddim = self.cfg.viz.vis_sample_ddim_step
        # local=True: vis runs on every process as an unsharded program
        # (see BaseTrainer.train_epochs vis cadence note)
        pts = np.asarray(self.sample(n, rng=jax.random.PRNGKey(step),
                                     ddim_step=ddim, local=True))
        clouds = normalize_point_clouds(pts[:, :, :3])
        img = visualize_point_clouds_3d(
            list(clouds), [f"gen-{i}" for i in range(len(clouds))])
        self.writer.add_image("vis/sample", img, step)

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
