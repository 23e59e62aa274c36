"""ADVICE r3: validate the fused SA kernel's Mosaic lowering on REAL TPU
— the count-gated pl.when chunks (sa_fused.py:179) are data-dependent and
were only parity-tested in interpret mode. Compares the compiled TPU
result against interpret mode (the tested-correct semantics) on the same
inputs, across sparse/dense hit regimes.

    python scripts/check_sa_hw.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lion_tpu.ops.pallas.sa_fused import pointnet_sa_fused_pallas

B, K = 8, 32


def run(n, m, c1, c2, radius, label):
    keys = jax.random.split(jax.random.PRNGKey(n + c1 + int(radius * 100)),
                            10)
    pts = jax.random.normal(keys[0], (B, n, 3), jnp.float32) * 0.3
    ctr = pts[:, :m, :]
    a_t = jax.random.normal(keys[1], (B, c1, n), jnp.float32)
    bc = jax.random.normal(keys[2], (B, c1, m), jnp.float32) * 0.1
    w2 = jax.random.normal(keys[3], (c2, c1), jnp.float32) * 0.2
    b2 = jax.random.normal(keys[4], (c2, 1), jnp.float32) * 0.1
    ca1 = 1.0 + 0.1 * jax.random.normal(keys[5], (B, c1))
    cb1 = 0.1 * jax.random.normal(keys[6], (B, c1))
    ca2 = 1.0 + 0.1 * jax.random.normal(keys[7], (B, c2))
    cb2 = 0.1 * jax.random.normal(keys[8], (B, c2))
    args = (pts, ctr, a_t, bc, (w2,), (b2,), (ca1, ca2), (cb1, cb2),
            radius, K)
    want = np.asarray(pointnet_sa_fused_pallas(*args, interpret=True),
                      np.float32)
    got = np.asarray(pointnet_sa_fused_pallas(*args), np.float32)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    ok = err <= 0.02 * max(scale, 1.0)
    print(f"{label}: N={n} M={m} C={c1}->{c2} r={radius}: "
          f"max|err|={err:.5f} scale={scale:.2f} {'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    ok = True
    ok &= run(2048, 1024, 32, 64, 0.02, "very-sparse")   # most chunks gated
    ok &= run(2048, 1024, 32, 64, 0.1, "sparse (SA0)")
    ok &= run(1024, 256, 64, 128, 0.2, "mid (SA1)")
    ok &= run(256, 64, 128, 128, 0.4, "dense (SA2)")
    ok &= run(256, 64, 128, 128, 2.0, "all-hit")         # no chunk gated
    print("ALL OK" if ok else "MISMATCH — fused SA lowering broken on HW")
    sys.exit(0 if ok else 1)
    sys.exit(0 if ok else 1)
