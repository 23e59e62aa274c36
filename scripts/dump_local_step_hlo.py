"""Dump the optimized HLO of the local-prior sampling step (the exact
jit used by profile_local_step.py) so trace instance names (fusion.NNNN,
copy.NNNN) can be mapped back to the producing ops.

    python scripts/dump_local_step_hlo.py [out.txt]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lion_tpu.models import LION
from __graft_entry__ import _flagship_cfg


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/local_step_hlo.txt"
    steps, batch = 30, 16
    cfg = _flagship_cfg()
    cfg.ddpm.num_steps = max(steps, 10)
    cfg.tpu.bf16 = True
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    params = lion.params

    ts = jnp.arange(steps - 1, -1, -1)
    cond = jax.random.normal(jax.random.PRNGKey(2), (batch, lion.style_dim))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (batch, lion.local_dim))

    def run(lp_params, x, rng, cond, ts):
        def fn(xx, timestep):
            return lion.local_prior.apply(
                {"params": lp_params}, xx, timestep.astype(jnp.float32),
                condition_input=cond)
        return lion.diffusion._denoise_ts(fn, rng, x, ts)

    rng = jax.random.PRNGKey(4)
    lowered = jax.jit(run).lower(params["local_prior"], x0, rng, cond, ts)
    compiled = lowered.compile()
    with open(out_path, "w") as f:
        f.write(compiled.as_text())
    print("wrote", out_path, os.path.getsize(out_path), "bytes")


if __name__ == "__main__":
    main()
