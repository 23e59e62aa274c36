"""Repro: ball_query_group_pallas scoped-VMEM OOM at the fp32 train shapes
(B=16, N=2048, M=1024, K=32, C=32) — VERDICT r1 weak #2."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lion_tpu.ops.points import ball_query_group

B, N, M, K, C = 16, 2048, 1024, 32, 32
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
ctr = jnp.asarray(rng.randn(B, M, 3), jnp.float32)
feats = jnp.asarray(rng.randn(B, N, C), jnp.float32)

print("backend:", jax.default_backend())
fn = jax.jit(lambda p, c, f: ball_query_group(p, c, f, 0.1, K, True))
try:
    out = fn(pts, ctr, feats)
    s = float(out.sum())
    print("OK fwd:", out.shape, out.dtype, s)
except Exception as e:
    print("FWD FAIL:", type(e).__name__)
    print(str(e)[:2000])

# and the backward (train path differentiates through it)
def loss(p, c, f):
    return jnp.sum(ball_query_group(p, c, f, 0.1, K, True) ** 2)

try:
    g = jax.jit(jax.grad(loss, argnums=(0, 2)))(pts, ctr, feats)
    print("OK bwd:", float(g[0].sum()), float(g[1].sum()))
except Exception as e:
    print("BWD FAIL:", type(e).__name__)
    print(str(e)[:2000])
