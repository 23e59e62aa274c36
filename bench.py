"""Benchmark: shapes/sec/chip for 2048-point 1000-step DDPM sampling.

The headline metric from BASELINE.json: generate 2048-point clouds via the
full LION hierarchy (1000-step global prior + 1000-step local prior + VAE
decode) and report shapes/sec on one chip.

Baseline context: the reference needs 1-2 h for ~400-660 shapes on an
A6000-class GPU (README.md:94) => roughly 0.06-0.18 shapes/sec. The
`vs_baseline` field is measured against 0.1 shapes/sec (the midpoint of
that published wall-clock window).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SHAPES_PER_SEC = 0.1  # README.md:94: 1-2h for 405-660 shapes


def main():
    from lion_tpu.models import LION
    from __graft_entry__ import _flagship_cfg

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    bf16 = os.environ.get("BENCH_BF16", "1") == "1"

    # 2 segments/prior: enough watchdog margin (each ~11 s device) while
    # keeping host/tunnel segment-boundary overhead negligible (chunks=4
    # measured 0.656 shapes/s vs 0.733 at chunks<=2)
    chunks = int(os.environ.get("BENCH_CHUNKS", "2"))

    cfg = _flagship_cfg()
    cfg.ddpm.num_steps = steps
    cfg.tpu.bf16 = bf16
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))

    rng = jax.random.PRNGKey(1)

    # compile + warmup (chunked: a single 1000-step device program exceeds
    # execution watchdogs on tunneled TPU runtimes)
    out = lion.sample_chunked(batch, rng, chunks=chunks)
    _ = float(jnp.sum(out["points"]))

    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = lion.sample_chunked(batch, jax.random.fold_in(rng, i),
                                  chunks=chunks)
    _ = float(jnp.sum(out["points"]))  # host sync
    dt = time.perf_counter() - t0

    shapes_per_sec = batch * n_iters / dt
    print(json.dumps({
        "metric": "shapes/sec/chip (2048-pt, %d-step DDPM, batch %d)"
                  % (steps, batch),
        "value": round(shapes_per_sec, 4),
        "unit": "shapes/sec",
        "vs_baseline": round(shapes_per_sec / REFERENCE_SHAPES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
