"""Demo / inference CLI (reference: demo.py).

Loads a checkpoint (released torch .pt or native .npz), samples shapes with
the full hierarchical diffusion as one jitted program, and saves/plots.
Text conditioning: --text runs a CLIP text encoder on host CPU (transformers;
falls back to a deterministic stub when no CLIP weights are cached — see
lion_tpu/utils/clip_helper.py), or --clip_feat takes precomputed features.
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser("lion_tpu demo")
    p.add_argument("--config", type=str, required=True,
                   help="cfg.yml from the checkpoint directory")
    p.add_argument("--ckpt", type=str, default="",
                   help="model checkpoint (.pt torch or .npz native)")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--ddim_step", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip_feat", type=str, default="",
                   help=".npy of precomputed CLIP features (text2shape)")
    p.add_argument("--text", type=str, default="",
                   help="text prompt(s), '|'-separated; encoded with CLIP "
                        "on host CPU (reference demo.py:31-36)")
    p.add_argument("--out", type=str, default="./samples.npz")
    p.add_argument("--plot", type=str, default="",
                   help="optional .png path for a matplotlib 3D scatter")
    args = p.parse_args()

    import jax
    from lion_tpu.config import get_default_cfg
    from lion_tpu.models import LION

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config)
    lion = LION(cfg)
    if args.ckpt.endswith(".pt"):
        lion.load_model(args.ckpt)
    elif args.ckpt:
        from lion_tpu.ckpt.io import load_checkpoint
        trees, _ = load_checkpoint(args.ckpt)
        lion.params = {
            "vae": trees["vae"],
            "global_prior": trees.get("ema_global", trees["dae_global"]),
            "local_prior": trees.get("ema_local", trees["dae_local"]),
        }
    else:
        print("WARNING: no checkpoint given; sampling from random init")
        lion.init_params(jax.random.PRNGKey(args.seed))

    clip_feat = None
    if args.clip_feat:
        clip_feat = np.load(args.clip_feat).astype(np.float32)
    elif args.text:
        from lion_tpu.utils.clip_helper import get_clip_encoder
        enc = get_clip_encoder()
        if not enc.is_real:
            print("WARNING: no CLIP weights cached; using deterministic "
                  "stub features (set LION_CLIP_MODEL to a local CLIP dir)")
        prompts = args.text.split("|")
        feats = enc.encode_text(prompts)
        # one prompt -> broadcast to all samples; else must match batch
        if len(prompts) == 1:
            feats = np.repeat(feats, args.num_samples, axis=0)
        clip_feat = feats.astype(np.float32)

    if args.ddim_step == 0 and cfg.ddpm.num_steps >= 500:
        # long chains: segmented scans (single >60s device programs can
        # trip execution watchdogs on tunneled runtimes)
        out = lion.sample_chunked(args.num_samples,
                                  jax.random.PRNGKey(args.seed),
                                  chunks=4, clip_feat=clip_feat)
    else:
        out = lion.sample(args.num_samples,
                          rng=jax.random.PRNGKey(args.seed),
                          clip_feat=clip_feat, ddim_step=args.ddim_step)
    pts = np.asarray(out["points"])
    np.savez(args.out, points=pts,
             z_global=np.asarray(out["z_global"]),
             z_local=np.asarray(out["z_local"]))
    print(f"saved {pts.shape} samples to {args.out}")

    if args.plot:
        from lion_tpu.utils.vis import plot_points
        plot_points(pts, args.plot)
        print(f"saved plot to {args.plot}")


if __name__ == "__main__":
    main()
