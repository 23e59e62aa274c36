"""Compile + time the FULL-SCALE stage-2 two-prior train step on the real
TPU (VERDICT r1 item #2: batch >= 8, 2048 points, full prior widths).

Usage: python scripts/profile_train_step.py [iters] [batch]

Reference hot loop being measured: trainers/train_2prior.py:195-410 (one
optimizer step over both priors with the frozen VAE encode in front).
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from __graft_entry__ import _flagship_cfg
    from lion_tpu.diffusion import DiffusionDiscretized
    from lion_tpu.models import VAE
    from lion_tpu.models.registry import (build_global_prior,
                                          build_local_prior)
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step

    cfg = _flagship_cfg()
    if os.environ.get("TRAIN_BF16", "0") == "1":
        # sde.autocast_train maps onto bf16 compute (trainers/base.py:58)
        cfg.sde.autocast_train = True
        cfg.tpu.bf16 = True
    n = cfg.data.tr_max_sample_points
    print("backend:", jax.default_backend(), "batch:", batch, "n:", n,
          "bf16:", bool(cfg.tpu.bf16))

    vae = VAE(cfg)
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    diffusion = DiffusionDiscretized(cfg)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, n, 3) * 0.3,
                    jnp.float32)
    t0 = time.perf_counter()
    vae_params = jax.jit(lambda: vae.init(
        {"params": jax.random.PRNGKey(0),
         "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, n, 3)))["params"])()
    gp_params = jax.jit(lambda: gp.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 128)),
        jnp.ones((1,)))["params"])()
    lp_params = jax.jit(lambda: lp.init(
        jax.random.PRNGKey(3), jnp.zeros((1, n * 4)), jnp.ones((1,)),
        condition_input=jnp.zeros((1, 128)))["params"])()
    n_params = sum(int(np.prod(a.shape)) for a in
                   jax.tree_util.tree_leaves({"g": gp_params,
                                              "l": lp_params}))
    print(f"init done in {time.perf_counter() - t0:.1f}s; "
          f"prior params: {n_params / 1e6:.2f}M")

    opt = make_optimizer(warmup_cosine_schedule(2e-4, 2e-4, 10, 10, 1, 10))
    state = create_train_state(
        {"global_prior": gp_params, "local_prior": lp_params}, opt,
        ema_decay=cfg.sde.ema_decay)
    step = jax.jit(make_prior_train_step(vae, gp, lp, diffusion, opt, cfg))

    t0 = time.perf_counter()
    state, metrics = step(state, vae_params, x, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  "
          f"loss={loss:.4f}")
    assert np.isfinite(loss), "loss not finite"

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, vae_params, x,
                              jax.random.fold_in(jax.random.PRNGKey(7), i))
    loss = float(metrics["loss"])  # host sync (block_until_ready is fake)
    dt = time.perf_counter() - t0
    print(f"{iters} steps in {dt:.2f}s = {dt / iters * 1e3:.1f} ms/step = "
          f"{batch * iters / dt:.1f} samples/sec   final loss {loss:.4f}")


if __name__ == "__main__":
    main()
