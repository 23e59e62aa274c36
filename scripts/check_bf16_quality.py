"""Full-scale bf16-vs-fp32 sampling drift check (on-chip).

Companion to tests/test_bf16_quality.py (tiny, CPU): runs the FLAGSHIP
spec (2048-point local prior, nf=2048 global prior) and measures

1. per-call denoiser drift: relative L2 between the bf16 and fp32 local
   prior evaluated at matched (x_t, t) across the timestep range — the
   per-step error the 1000-step chain integrates;
2. end-to-end chain drift: full 1000-step DDPM chains from the SAME RNG
   in fp32 vs bf16; reports the paired Chamfer distance between dtype
   twins vs the cross-sample Chamfer between different shapes (the scale
   that matters for 1-NNA: paired drift must sit far below it).

    python scripts/check_bf16_quality.py [BATCH=4] [STEPS=1000]

Numbers recorded in README.md ("bf16 sampling quality").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from lion_tpu.models import LION
    from __graft_entry__ import _flagship_cfg

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    cfg32 = _flagship_cfg()
    cfg32.ddpm.num_steps = steps
    cfg32.tpu.bf16 = False
    lion32 = LION(cfg32)
    lion32.init_params(jax.random.PRNGKey(0))

    cfg16 = _flagship_cfg()
    cfg16.ddpm.num_steps = steps
    cfg16.tpu.bf16 = True
    lion16 = LION(cfg16)
    lion16.params = lion32.params        # identical fp32 weights
    lion16.num_points = lion32.num_points
    lion16.style_dim = lion32.style_dim
    lion16.local_dim = lion32.local_dim

    # ---- 1. per-call eps drift over the t range -------------------------
    rng = jax.random.PRNGKey(5)
    cond = jax.random.normal(jax.random.fold_in(rng, 1),
                             (batch, lion32.style_dim))
    x0 = jax.random.normal(jax.random.fold_in(rng, 2),
                           (batch, lion32.local_dim))
    noise = jax.random.normal(jax.random.fold_in(rng, 3), x0.shape)
    d = lion32.diffusion

    @jax.jit
    def eps32(x, t):
        return lion32.local_prior.apply(
            {"params": lion32.params["local_prior"]}, x, t,
            condition_input=cond)

    @jax.jit
    def eps16(x, t):
        return lion16.local_prior.apply(
            {"params": lion16.params["local_prior"]}, x, t,
            condition_input=cond)

    rels = []
    for frac in (0.999, 0.9, 0.75, 0.5, 0.25, 0.1, 0.01):
        ti = max(int(steps * frac) - 1, 0)
        ab = d.alpha_bars[ti]
        x_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise
        t = jnp.full((batch,), float(ti + 1))
        a = np.asarray(eps32(x_t, t), np.float32)
        b = np.asarray(eps16(x_t, t), np.float32)
        rel = float(np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-9))
        rels.append(rel)
        print(f"t={ti + 1:5d}  per-call eps rel-L2: {rel:.5f}")
    print(f"per-call drift: mean {np.mean(rels):.5f} max {np.max(rels):.5f}")

    # ---- 2. end-to-end chain drift ---------------------------------------
    t0 = time.perf_counter()
    srng = jax.random.PRNGKey(11)
    out32 = np.asarray(
        lion32.sample_chunked(batch, srng, chunks=2)["points"],
        np.float32)[:, :, :3]
    out16 = np.asarray(
        lion16.sample_chunked(batch, srng, chunks=2)["points"],
        np.float32)[:, :, :3]
    print(f"chains done in {time.perf_counter() - t0:.1f}s")

    def chamfer(a, b):
        dm = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return dm.min(1).mean() + dm.min(0).mean()

    paired = np.mean([chamfer(out32[i], out16[i]) for i in range(batch)])
    cross = np.mean([chamfer(out32[i], out32[(i + 1) % batch])
                     for i in range(batch)])
    print(f"paired CD (fp32 vs bf16 twin): {paired:.6f}")
    print(f"cross  CD (different samples): {cross:.6f}")
    print(f"ratio paired/cross: {paired / max(cross, 1e-12):.4f}"
          "  (<< 1 means bf16 lands on the same shape)")


if __name__ == "__main__":
    main()
