"""Measure megafused pvconv_block_pair vs the 3-kernel chain per shape.

For each candidate (r, c, n) PVConv voxel-branch shape, times:
  A: avg_voxelize -> conv3d_packed_fused x2 (with the GN fold between)
     -> trilinear_devoxelize   (the current dispatch for non-megafused
     shapes, lion_tpu/nn/pvconv.py)
  B: pvconv_block_pair          (ops/pallas/pvblock.py)
and checks numeric agreement. Drives the supports_block_pair allowlist.

    python scripts/bench_pvblock_shapes.py [ITERS=50]
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

from lion_tpu.ops.voxel import voxelize, trilinear_devoxelize
from lion_tpu.ops.pallas.conv3d_packed import conv3d_packed_fused
from lion_tpu.ops.pallas.pvblock import pvconv_block_pair, block_vmem_bytes

B = int(os.environ.get("BENCH_B", "16"))
# (label, r, c, n): every equal-channel PVConv voxel branch in the local
# prior (models/priors.py LOCAL_PRIOR_* specs)
SHAPES = [
    ("SA0b2 r32 c32 n2048", 32, 32, 2048),
    ("FP3   r32 c64 n2048", 32, 64, 2048),
    ("FP2   r16 c128 n1024", 16, 128, 1024),
    ("FP1   r8  c128 n256", 8, 128, 256),
    ("FP0   r8  c128 n64", 8, 128, 64),
]


def fold_affine(st, b0, ca, cb, count, c):
    s1 = st[:, 0, :] / count + b0
    ex2 = st[:, 1, :] / count + 2.0 * b0 * (st[:, 0, :] / count) + b0 * b0
    cg = c // 8
    mu = s1.reshape(B, 8, cg).mean(-1, keepdims=True)
    gex2 = ex2.reshape(B, 8, cg).mean(-1, keepdims=True)
    var = jnp.maximum(gex2 - mu * mu, 0.0)
    rs = jax.lax.rsqrt(var + 1e-5)
    sc = (rs * ca.reshape(B, 8, cg)).reshape(B, c)
    bi = ((b0.reshape(1, 8, cg) - mu) * rs * ca.reshape(B, 8, cg)
          ).reshape(B, c) + cb
    return sc, bi


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    key = jax.random.PRNGKey(0)
    for label, r, c, n in SHAPES:
        ks = jax.random.split(jax.random.fold_in(key, r * c + n), 8)
        feats = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
        xyz = jax.random.normal(ks[1], (B, n, 3), jnp.float32)
        w0 = jax.random.normal(ks[2], (3, 3, 3, c, c), jnp.float32) * 0.1
        w1 = jax.random.normal(ks[3], (3, 3, 3, c, c), jnp.float32) * 0.1
        b0 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
        ca = 1.0 + jax.random.normal(ks[5], (B, c), jnp.float32) * 0.1
        cb = jax.random.normal(ks[6], (B, c), jnp.float32) * 0.1
        count = float(r) ** 3

        @jax.jit
        def chain(feats, xyz, w0, b0, ca, cb, w1):
            grid, nc = voxelize(feats, xyz, r)
            xp = grid.reshape(B, r * r, r * c)
            y0, st0 = conv3d_packed_fused(xp, w0.astype(jnp.bfloat16), r,
                                          want_stats=True)
            sc0, bi0 = fold_affine(st0, b0, ca, cb, count, c)
            y1, st1 = conv3d_packed_fused(y0, w1.astype(jnp.bfloat16), r,
                                          in_scale=sc0, in_bias=bi0,
                                          pre_swish=True, want_stats=True)
            pts = trilinear_devoxelize(
                y1.reshape(B, r, r, r, c), nc, r)
            return pts, st1

        @jax.jit
        def fused(feats, xyz, w0, b0, ca, cb, w1):
            from lion_tpu.ops.voxel import normalize_coords
            nc = normalize_coords(xyz, r, True, 0.0)
            vc = jnp.round(nc).astype(jnp.int32)
            return pvconv_block_pair(feats, vc, nc, w0, b0, ca, cb, w1, r)

        pa, sa = jax.block_until_ready(chain(feats, xyz, w0, b0, ca, cb, w1))
        try:
            pb, sb = jax.block_until_ready(
                fused(feats, xyz, w0, b0, ca, cb, w1))
        except Exception as e:  # VMEM OOM / unsupported
            print(f"{label}: fused FAILED: {type(e).__name__} "
                  f"(vmem est {block_vmem_bytes(r, c, n)/2**20:.0f} MB)")
            continue
        err = float(jnp.max(jnp.abs(pa.astype(jnp.float32)
                                    - pb.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(pa.astype(jnp.float32)))) + 1e-6

        def timeit(fn):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(feats, xyz, w0, b0, ca, cb, w1)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1e3

        ta = timeit(chain)
        tb = timeit(fused)
        print(f"{label}: chain {ta:7.3f} ms  fused {tb:7.3f} ms  "
              f"({(ta - tb) * 1e3:+6.0f} us)  relerr {err / scale:.2e}")


if __name__ == "__main__":
    main()
