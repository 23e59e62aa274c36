"""Per-component timing of the hierarchical sampling path on real hardware.

Usage: python scripts/profile_sample.py [--steps 100] [--batch 16]
Reports ms/step for the global prior scan, local prior scan, decode, and the
implied full-1000-step shapes/sec.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    # chain a reduction to force completion (block_until_ready can be a
    # no-op over the tunnel)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "sum")]
    float(leaves[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "sum")]
    float(leaves[0].sum())
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--trace", type=str, default="",
                   help="optional jax.profiler trace dir")
    args = p.parse_args()

    from lion_tpu.models import LION
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    cfg.ddpm.num_steps = args.steps
    cfg.tpu.bf16 = True
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    params = lion.params
    diffusion = lion.diffusion
    b = args.batch
    ts = jnp.arange(args.steps - 1, -1, -1)

    @jax.jit
    def run_global(x, rng):
        def fn(xx, tt):
            return lion.global_prior.apply(
                {"params": params["global_prior"]}, xx,
                tt.astype(jnp.float32))
        return diffusion._denoise_ts(fn, rng, x, ts)

    @jax.jit
    def run_local(x, rng, cond):
        def fn(xx, tt):
            return lion.local_prior.apply(
                {"params": params["local_prior"]}, xx,
                tt.astype(jnp.float32), condition_input=cond)
        return diffusion._denoise_ts(fn, rng, x, ts)

    @jax.jit
    def run_decode(zg, zl, rng):
        from lion_tpu.models.vae import VAE
        return lion.vae.apply({"params": params["vae"]}, b,
                              decomposed_eps=[zg, zl], method=VAE.sample,
                              rngs={"sample": rng})

    rng = jax.random.PRNGKey(1)
    xg = jax.random.normal(rng, (b, lion.style_dim))
    xl = jax.random.normal(rng, (b, lion.local_dim))

    tg, (zg, _) = timed(run_global, xg, rng)
    print(f"global prior: {tg*1e3:.1f} ms / {args.steps} steps "
          f"({tg/args.steps*1e3:.3f} ms/step) batch {b}")

    tl, (zl, _) = timed(run_local, xl, rng, zg)
    print(f"local prior:  {tl*1e3:.1f} ms / {args.steps} steps "
          f"({tl/args.steps*1e3:.3f} ms/step) batch {b}")

    td, pts = timed(run_decode, zg, zl, rng)
    print(f"decode:       {td*1e3:.1f} ms")

    full = (tg + tl) * (1000 / args.steps) + td
    print(f"implied 1000-step: {full:.2f} s/batch -> "
          f"{b/full:.3f} shapes/sec")

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = run_local(xl, rng, zg)
            float(out[0].sum())
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
