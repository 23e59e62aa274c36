"""Microbenchmark the local-prior U-Net's op families at their real shapes.

The sampling profile shows the local prior at ~54 ms/step (batch 16) vs
0.12 ms for the global prior: this script breaks that 54 ms down by op.
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
DT = jnp.bfloat16


def timed(label, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:<46s} {dt:8.3f} ms")
    return dt


def main():
    from lion_tpu.ops.points import furthest_point_sample, ball_query, \
        grouping
    from lion_tpu.ops.voxel import voxelize, trilinear_devoxelize
    from lion_tpu.ops.interpolate import nearest_neighbor_interpolate

    rng = jax.random.PRNGKey(0)
    total = 0.0

    # SA stage shapes of the local prior (priors.py specs):
    # stage1: N=2048 -> 1024 centers, r=0.1, k=32, pvconv r=32 ch 32
    # stage2: 1024 -> 256, k=32, pvconv r=16 ch 64
    # stage3: 256 -> 64, k=32, pvconv r=8 ch 128
    # stage4: 64 -> 16 (no pvconv)
    sa = [(2048, 1024, 32, 32, 32), (1024, 256, 32, 16, 64),
          (256, 64, 32, 8, 128), (64, 16, 32, 0, 128)]
    for i, (n, m, k, r, c) in enumerate(sa):
        pts = jax.random.normal(jax.random.fold_in(rng, i), (B, n, 3))
        feat = jax.random.normal(jax.random.fold_in(rng, i + 10),
                                 (B, n, c)).astype(DT)
        total += timed(f"SA{i+1} fps {n}->{m}",
                       lambda p: furthest_point_sample(p, m), pts)
        centers = pts[:, :m]
        total += timed(f"SA{i+1} ball_query+group k={k}",
                       lambda p, ce, fe: grouping(
                           fe, ball_query(ce, p, 0.2, k)), pts, centers,
                       feat)
        if r:
            total += timed(f"SA{i+1} voxelize r={r} c={c}",
                           lambda fe, p: voxelize(fe, p, r)[0], feat, pts)
            grid = jax.random.normal(rng, (B, r, r, r, c)).astype(DT)
            ncoords = (pts - pts.min()) / (pts.max() - pts.min()) * (r - 1)
            total += timed(f"SA{i+1} devox r={r} c={c}",
                           lambda g, p: trilinear_devoxelize(g, p, r),
                           grid, ncoords)
            # the two k3 conv3ds
            w = jax.random.normal(rng, (3, 3, 3, c, c)).astype(DT) * 0.01
            total += timed(f"SA{i+1} conv3d k3 r={r} c={c} x2",
                           lambda g, ww: jax.lax.conv_general_dilated(
                               jax.lax.conv_general_dilated(
                                   g, ww, (1, 1, 1), "SAME",
                                   dimension_numbers=("NDHWC", "DHWIO",
                                                      "NDHWC")),
                               ww, (1, 1, 1), "SAME",
                               dimension_numbers=("NDHWC", "DHWIO",
                                                  "NDHWC")), grid, w)

    # FP stages: 3-NN interpolate at each upsampling
    fp = [(16, 64, 128), (64, 256, 128), (256, 1024, 128), (1024, 2048, 64)]
    for i, (m, n, c) in enumerate(fp):
        centers = jax.random.normal(jax.random.fold_in(rng, 30 + i),
                                    (B, m, 3))
        pts = jax.random.normal(jax.random.fold_in(rng, 40 + i), (B, n, 3))
        feat = jax.random.normal(rng, (B, m, c)).astype(DT)
        total += timed(f"FP{i+1} 3nn_interp {m}->{n} c={c}",
                       lambda ce, p, fe: nearest_neighbor_interpolate(
                           p, ce, fe), centers, pts, feat)

    # global attention at bottleneck (N=16, C=128+) and SA1 attention
    from lion_tpu.nn.common import LinearAttention
    att = LinearAttention(128)
    x = jax.random.normal(rng, (B, 256, 128)).astype(DT)
    p = att.init(rng, x)
    total += timed("LinearAttention N=256 C=128",
                   lambda xx: att.apply(p, xx), x)

    print(f"{'sum of pieces':<46s} {total:8.3f} ms (x2-ish per U-Net fwd, "
          f"+ MLPs)")


if __name__ == "__main__":
    main()
