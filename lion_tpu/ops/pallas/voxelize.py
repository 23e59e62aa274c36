"""Pallas TPU kernel for average-pool voxelization.

The XLA scatter (even sorted/unique) runs at ~5 GB/s on TPU (~15 ms per
U-Net forward at batch 16). Here the scatter becomes a gather-as-matmul on
the MXU. v1 contracted per-x-slab one-hots against (N, CP) features with
CP lane-padded to 128 — for C=32 that wastes 4x of every MXU pass and
costs r^2*N*128 MACs per slab. v2 packs (z, c) jointly into lanes:

    G (r^2, r*C + r) = onehot_xy (r^2, N) @ [Fz ++ Zoh] (N, r*C + r)

where Fz[n, z*C + c] = (z_n == z) * f[n, c] and Zoh is the z one-hot whose
contraction yields the per-cell counts (vox.cu:18-72 sum/count semantics).
Lanes are fully packed (r*C = 1024 for every PVConv shape in the model),
cutting MACs ~4x for C=32 and fusing the count computation into the same
matmul. The xy dimension is tiled; the rhs is built once per batch item
in VMEM scratch and reused across xy tiles.

Backward (gather of grad/count at each point's cell, vox.cu:86-110)
replays through XLA in the custom_vjp registered by lion_tpu.ops.voxel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vox_kernel(r, coords_ref, feats_ref, out_ref, rhs_buf):
    # coords_ref: (1, 3, N) int32; feats_ref: (1, N, C) fp32
    # out_ref: (1, rt, Lp) fp32; rhs_buf: (N, Lp) bf16 scratch
    n = coords_ref.shape[2]
    c = feats_ref.shape[2]
    rt = out_ref.shape[1]
    lp = rhs_buf.shape[1]
    j = pl.program_id(1)

    # build rhs once per batch item (persists across xy tiles); all stores
    # are 128-lane chunks and all temporaries are >=128 lanes wide (narrow
    # -lane values tile-pad to 128 lanes of VMEM each -- a list of C=4
    # slices at a concat would transiently cost 32x its logical size)
    @pl.when(j == 0)
    def _():
        z_col = coords_ref[0, 2:3, :].reshape(n, 1)       # (N, 1) int32
        f = feats_ref[0].astype(jnp.bfloat16)             # (N, C)
        chunk = max(1, min(r, 128 // c))                  # z's per 128 lanes
        cw = chunk * c                                    # chunk lane width
        if chunk > 1:
            t = f
            while t.shape[1] < cw:                        # log-doubling tile
                t = jnp.concatenate([t, t], axis=1)
            zoff = lax.broadcasted_iota(jnp.int32, (n, cw), 1) // c
            for base in range(0, r, chunk):
                rhs_buf[:, base * c:base * c + cw] = jnp.where(
                    zoff + base == z_col, t, 0)
        else:
            for z in range(r):
                rhs_buf[:, z * c:(z + 1) * c] = jnp.where(z_col == z, f, 0)
        zoh = (z_col == lax.broadcasted_iota(jnp.int32, (n, r), 1)
               ).astype(jnp.bfloat16)                     # (N, r) counts
        pad = lp - r * c - r
        tail = (zoh if not pad else jnp.concatenate(
            [zoh, jnp.zeros((n, pad), jnp.bfloat16)], axis=1))
        rhs_buf[:, r * c:] = tail

    # one-hot built and contracted in row-halves, each half's full
    # pipeline (build -> dot -> count-divide -> emit) emitted in
    # sequence: half h+1's VPU one-hot build and half h's divide overlap
    # half-neighbouring MXU dots (same interleave as devox.py, r4)
    xy_n = coords_ref[0, 0:1, :] * r + coords_ref[0, 1:2, :]   # (1, N)
    halves = 2 if rt % 2 == 0 and rt >= 512 else 1
    rh = rt // halves
    zrow = lax.broadcasted_iota(jnp.int32, (r, r * c), 0)
    zlane = lax.broadcasted_iota(jnp.int32, (r, r * c), 1) // c
    e = (zrow == zlane).astype(jnp.bfloat16)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    gs = []
    for h in range(halves):
        row = (lax.broadcasted_iota(jnp.int32, (rh, n), 0)
               + j * rt + h * rh)
        onehot = jnp.where(row == xy_n, 1.0, 0.0).astype(jnp.bfloat16)
        gs.append(jax.lax.dot_general(
            onehot, rhs_buf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))          # (rh, Lp)
    for h in range(halves):
        g = gs[h]
        # divide sums by counts in-kernel (128-lane chunks stay aligned)
        # and emit bf16 -- the XLA postlude (slice + divide + convert
        # over the tile-inflated 5D grid) costs more than the matmul.
        # The reciprocal runs on the SMALL (rh, r) count matrix, then
        # expands into (z, c) lanes with ONE expansion dot; hi/lo split
        # keeps the fp32 reciprocal exact through the bf16 MXU.
        rcp = 1.0 / jnp.maximum(g[:, r * c:r * c + r], 1.0)   # (rh, r)
        hi = rcp.astype(jnp.bfloat16)
        lo = (rcp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mul = mm(hi, e) + mm(lo, e)                       # (rh, r*c)
        out_ref[0, h * rh:(h + 1) * rh] = \
            (g[:, :r * c] * mul).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def avg_voxelize_pallas(features: jnp.ndarray, vox_coords: jnp.ndarray,
                        resolution: int) -> jnp.ndarray:
    """features (B, N, C), vox_coords (B, N, 3) int32 -> (B, R, R, R, C)."""
    b, n, c = features.shape
    r = resolution
    lp = ((r * c + r + 127) // 128) * 128
    # xy-row tile: fit rhs scratch (n*lp bf16) + matmul result temp
    # (rt*lp fp32) + out tiles + onehot/iota temporaries (~rt*n*16B)
    rt = min(r * r, 1024)
    while rt > 8 and (rt * n * 16 + rt * lp * 4 + rt * r * c * 4
                      + n * lp * 2) > 48 * 2 ** 20:
        rt //= 2
    coords_t = jnp.transpose(vox_coords, (0, 2, 1)).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_vox_kernel, r),
        out_shape=jax.ShapeDtypeStruct((b, r * r, r * c), features.dtype),
        grid=(b, (r * r) // rt),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, r * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, lp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(coords_t, features if features.dtype in (jnp.bfloat16, jnp.float32)
      else features.astype(jnp.float32))  # kernel rounds to bf16 anyway
    # (b, (x,y) rows, (z,c) lanes) is exactly (b, r, r, r, c) row-major
    return out.reshape(b, r, r, r, c)
