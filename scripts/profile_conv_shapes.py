"""Per-shape cost of conv3d_3x3_fused at the local-prior hot shapes.
Each shape runs ITERS times inside one lax.scan (amortizes dispatch).

    python scripts/profile_conv_shapes.py
"""
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

B = int(os.environ.get("PROF_BATCH", "16"))
ITERS = 20

# (r, cin, cout, count-in-local-prior-step)
SHAPES = [
    (32, 32, 32, 4),
    (32, 64, 64, 4),
    (16, 64, 64, 6),
    (16, 128, 128, 4),
    (8, 128, 128, 18),
]


def main():
    from lion_tpu.ops.pallas.conv3d import conv3d_3x3_fused

    total = 0.0
    for r, ci, co, cnt in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, r, r, r, ci),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co),
                              jnp.bfloat16) * 0.05
        sc = jnp.ones((B, ci), jnp.float32)
        bi = jnp.zeros((B, ci), jnp.float32)

        @jax.jit
        def run(x, w, sc, bi):
            def step(carry, _):
                y, st = conv3d_3x3_fused(carry, w, in_scale=sc, in_bias=bi,
                                         pre_swish=True, want_stats=True)
                y = y + (st[:, 1, :1] * 0)[:, None, None, None, :].astype(
                    y.dtype)
                return y[..., :ci] if co != ci else y, ()
            out, _ = jax.lax.scan(step, x, None, length=ITERS)
            return out

        out = run(x, w, sc, bi)
        _ = float(out.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        out = run(x, w, sc, bi)
        _ = float(out.astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        flops = 2 * B * r**3 * 27 * ci * co
        eff = flops / (dt / 1e3) / 197e12 * 100
        print(f"r={r:3d} {ci:4d}->{co:4d}  {dt:7.3f} ms/conv  x{cnt} "
              f"= {dt*cnt:7.2f} ms/step   MXU {eff:5.1f}%")
        total += dt * cnt
    print(f"total conv per local step: {total:.2f} ms")


if __name__ == "__main__":
    main()
