"""Train/eval CLI (reference: train_dist.py).

Same surface: `python train_dist.py [--config cfg.yml] [--pretrained ckpt]
[--eval_generation] k v k v ...` with yacs-style positional overrides.
The reference's per-GPU process spawn + NCCL init becomes single-controller
JAX over a device mesh (multi-host via jax.distributed.initialize when
launched once per host).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys


def get_args(argv=None):
    p = argparse.ArgumentParser("lion_tpu train/eval")
    p.add_argument("--config", type=str, default="",
                   help="yaml config to merge over defaults")
    p.add_argument("--exp_root", type=str, default="./exp")
    p.add_argument("--data_root", type=str, default=None,
                   help="override cfg.data.data_dir")
    p.add_argument("--pretrained", type=str, default="",
                   help="checkpoint to load")
    p.add_argument("--eval_generation", action="store_true",
                   help="sample + score instead of training")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--skip_sample", action="store_true")
    p.add_argument("--num_samples", type=int, default=0,
                   help="override number of generated samples for eval")
    p.add_argument("--distributed_init", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="yacs-style `key value` override pairs")
    return p.parse_args(argv)


def build_cfg(args):
    from lion_tpu.config import get_default_cfg
    cfg = get_default_cfg()
    if args.config:
        cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.data_root:
        cfg.data.data_dir = args.data_root
    # exp identity = md5-6 of the config dump (reference train_dist.py:181)
    cfg_hash = hashlib.md5(cfg.dump().encode()).hexdigest()[:6]
    if not cfg.hash:
        cfg.hash = cfg_hash
    if not cfg.save_dir:
        cfg.save_dir = os.path.join(args.exp_root,
                                    f"{cfg.data.cates}_{cfg_hash}")
    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.save_dir, "cfg.yml"))
    return cfg


def apply_debug_flags(cfg):
    """reference train_dist.py:33-37 torch.autograd.set_detect_anomaly;
    the JAX analog is jax_debug_nans (re-runs NaN-producing jitted ops
    un-jitted to locate them). Same caveat: slows training."""
    if cfg.set_detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)
        print("!" * 30 + "\nWARNING: set_detect_anomaly is on "
              "(jax_debug_nans); it can slow down training!\n" + "!" * 30)


def main(argv=None):
    args = get_args(argv)
    if args.distributed_init:
        import jax
        jax.distributed.initialize()
    cfg = build_cfg(args)

    apply_debug_flags(cfg)

    from lion_tpu.trainers import get_trainer
    trainer_cls = get_trainer(cfg.trainer.type)
    args.save_dir = cfg.save_dir
    trainer = trainer_cls(cfg, args)

    if args.pretrained:
        trainer.resume(args.pretrained)
    else:
        # snapshot auto-resume, always attempted (train_dist.py:60-69 sets
        # args.resume whenever checkpoints/snapshot exists)
        resumed = trainer.resume(None)
        if args.resume and not resumed:
            print(f"WARNING: --resume given but no snapshot found under "
                  f"{trainer.ckpt_dir}; starting fresh")

    if args.eval_generation:
        run_eval_generation(trainer, cfg, args)
    else:
        trainer.train_epochs()


def run_eval_generation(trainer, cfg, args):
    """Sample num_ref shapes and score them (base_trainer.py eval_sample +
    eval_helper.compute_score)."""
    import jax
    import numpy as np
    import torch
    from lion_tpu.eval import compute_score, get_cats, get_ref_num, get_ref_pt

    cats = get_cats(cfg.data.cates)
    num_ref = args.num_samples or cfg.num_ref or get_ref_num(cats)
    batch = cfg.data.batch_size_test
    out_dir = os.path.join(cfg.save_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    sample_path = os.path.join(out_dir, "samples.pt")

    if not args.skip_sample or not os.path.exists(sample_path):
        all_pcs = []
        seed = cfg.trainer.seed
        for i in range(0, num_ref, batch):
            n = min(batch, num_ref - i)
            # per-iteration reseed (base_trainer.py:459-463)
            rng = jax.random.PRNGKey(seed + i)
            pts = trainer.sample(n, rng=rng,
                                 ddim_step=cfg.eval_ddim_step)
            all_pcs.append(np.asarray(pts))
            print(f"sampled {i + n}/{num_ref}")
        gen = np.concatenate(all_pcs)[:num_ref]
        torch.save(torch.from_numpy(gen), sample_path)

    ref_path = get_ref_pt(cats, cfg.data.type,
                          root=getattr(args, "ref_root", None)
                          or "./datasets/test_data/")
    if ref_path and os.path.exists(ref_path):
        compute_score(sample_path, ref_path,
                      batch_size_test=cfg.data.batch_size_test,
                      dataset=cats, hash=cfg.hash, step=trainer.step,
                      results_dir=os.path.join(cfg.save_dir, "results"))
    else:
        print(f"reference set not found ({ref_path}); samples saved to "
              f"{sample_path}")


if __name__ == "__main__":
    main()
