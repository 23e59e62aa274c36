"""Import/compile smoke test (reference: build_pkg.py, which JIT-compiled
the CUDA extensions by importing). Here it imports every lion_tpu layer and
traces the Pallas hot-path kernels in interpret mode so a broken kernel is
caught before a long run."""
import jax
import jax.numpy as jnp

import lion_tpu  # noqa: F401
from lion_tpu import config, data, diffusion, eval as lion_eval  # noqa
from lion_tpu import models, nn, ops, trainers, utils  # noqa
from lion_tpu.ops.points import ball_query_group, furthest_point_sample
from lion_tpu.ops.voxel import trilinear_devoxelize, voxelize

pts = jnp.zeros((1, 64, 3))
feats = jnp.zeros((1, 64, 8))
grid, nc = voxelize(feats, pts, 8)
trilinear_devoxelize(grid, nc, 8)
furthest_point_sample(pts, 16)
ball_query_group(pts, pts[:, :16], feats, 0.2, 4)
print("lion_tpu build OK on", jax.default_backend())
