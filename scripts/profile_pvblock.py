"""On-chip parity + timing: megafused PVConv block kernel vs the 3-kernel
chain (avg_voxelize_pallas -> conv3d_packed_pair -> devox_pallas).

    python scripts/profile_pvblock.py [BATCH=16] [ITERS=50]
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
    from lion_tpu.ops.pallas.conv3d_packed import conv3d_packed_pair
    from lion_tpu.ops.pallas.devox import trilinear_devoxelize_pallas
    from lion_tpu.ops.pallas.pvblock import pvconv_block_pair
    from lion_tpu.ops.pallas.voxelize import avg_voxelize_pallas
    from lion_tpu.ops.voxel import normalize_coords

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    r, c, n = 32, 64, 2048
    dt = jnp.bfloat16

    k = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.fold_in(k, 0), (b, n, c), dt)
    xyz = jax.random.normal(jax.random.fold_in(k, 1), (b, n, 3),
                            jnp.float32) * 0.3
    w0 = (jax.random.normal(jax.random.fold_in(k, 2), (3, 3, 3, c, c),
                            jnp.float32) * 0.05)
    w1 = (jax.random.normal(jax.random.fold_in(k, 3), (3, 3, 3, c, c),
                            jnp.float32) * 0.05)
    b0 = 0.1 * jax.random.normal(jax.random.fold_in(k, 4), (c,))
    ca = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 5), (b, c))
    cb = 0.1 * jax.random.normal(jax.random.fold_in(k, 6), (b, c))

    norm_coords = normalize_coords(xyz, r)
    vox_c = jnp.round(norm_coords).astype(jnp.int32)

    @jax.jit
    def chain(feats, vox_c, norm_coords, w0, b0, ca, cb, w1):
        grid = avg_voxelize_pallas(feats, vox_c, r)
        xp = grid.reshape(b, r * r, r * c)
        y1p, st1 = conv3d_packed_pair(xp, w0.astype(dt), b0, ca, cb,
                                      w1.astype(dt), r)
        y1 = y1p.reshape(b, r, r, r, c)
        pts = trilinear_devoxelize_pallas(y1, norm_coords, r)
        return pts, st1

    @jax.jit
    def block(feats, vox_c, norm_coords, w0, b0, ca, cb, w1):
        return pvconv_block_pair(feats, vox_c, norm_coords,
                                 w0.astype(dt), b0, ca, cb,
                                 w1.astype(dt), r)

    a_pts, a_st = chain(feats, vox_c, norm_coords, w0, b0, ca, cb, w1)
    b_pts, b_st = block(feats, vox_c, norm_coords, w0, b0, ca, cb, w1)
    a_pts, b_pts = np.asarray(a_pts, np.float32), np.asarray(b_pts, np.float32)
    err = np.abs(a_pts - b_pts).max()
    scale = np.abs(a_pts).max()
    st_err = np.abs(np.asarray(a_st) - np.asarray(b_st)).max()
    st_scale = np.abs(np.asarray(a_st)).max()
    print(f"parity: pts max-abs-err {err:.5f} (scale {scale:.3f}), "
          f"stats {st_err:.4f} (scale {st_scale:.1f})")

    for name, fn in [("chain", chain), ("block", block)]:
        out = fn(feats, vox_c, norm_coords, w0, b0, ca, cb, w1)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(feats, vox_c, norm_coords, w0, b0, ca, cb, w1)
        jax.block_until_ready(out)
        dt_ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt_ms:.3f} ms/call (batch {b})")


if __name__ == "__main__":
    main()
