"""Point-binned (sorted) average-pool voxelization — Pallas TPU kernel.

The dense kernel (voxelize.py) contracts every (xy-row tile, point) pair:
r^2 * N * (r*C + r) MACs against ~6% grid occupancy at r = 32, N = 2048.
Here the points are pre-sorted by xy voxel key in XLA (one lax.sort of
three (B, N) int rows), so a static tile of W sorted points only touches
the CONTIGUOUS key window [qlo[t], qhi[t]] — every (point-tile, key-tile)
pair outside the window is skipped with pl.when and its MXU dot never
issues. Measured on v5e (B = 16, N = 2048, scripts/exp_binned_voxdevox.py,
round 5): 1061 -> 907 us/call at r32/C32, 1615 -> 1191 at r32/C64, sort
included; r = 16 measures SLOWER than dense (sort overhead vs a cheap
grid), so dispatch gates on r >= 32.

Inside the kernel the feature permutation into sorted order rides the MXU
as one-hot gather dots ((W, N) @ (N, C), 268M MACs total — ~16x cheaper
than the dense scatter product at C = 64), then the z-packed rhs build and
the count lanes match the dense kernel exactly (vox.cu:18-72 sum/count
semantics; the count divide uses the same hi/lo bf16 split trick).

Backward replays through XLA in lion_tpu.ops.voxel's custom_vjp, same as
the dense kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vox_binned_kernel(r, w, meta_ref, feats_ref, qlo_ref, qhi_ref, ft_ref,
                       out_ref, rhs_buf, acc_buf):
    # meta_ref (1, 3, N) int32 rows: [sorted xy key, sorted z, sorted idx]
    # feats_ref (1, N, C) fp32 ORIGINAL order; qlo/qhi (B, T), ft (B, KT)
    # in SMEM; out_ref (1, RT, r*C); rhs_buf (N, Lp) bf16; acc (RT, Lp) f32
    n = meta_ref.shape[2]
    c = feats_ref.shape[2]
    rt = out_ref.shape[1]
    lp = rhs_buf.shape[1]
    tt = n // w
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # permute features into sorted order tile by tile (one-hot gather
        # dot), then z-pack into the same (z, c)-lane rhs layout as the
        # dense kernel, with the z one-hot count lanes appended.
        iota_n = lax.broadcasted_iota(jnp.int32, (w, n), 1)
        f = feats_ref[0].astype(jnp.bfloat16)
        chunk = max(1, min(r, 128 // c))
        cw = chunk * c
        for t in range(tt):
            sl = slice(t * w, (t + 1) * w)
            sidx_t = meta_ref[0, 2:3, sl].reshape(w, 1)
            oh = (sidx_t == iota_n).astype(jnp.bfloat16)
            f_s = lax.dot_general(
                oh, f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            z_col = meta_ref[0, 1:2, sl].reshape(w, 1)
            if chunk > 1:
                tl = f_s
                while tl.shape[1] < cw:
                    tl = jnp.concatenate([tl, tl], axis=1)
                zoff = lax.broadcasted_iota(jnp.int32, (w, cw), 1) // c
                for base in range(0, r, chunk):
                    rhs_buf[sl, base * c:base * c + cw] = jnp.where(
                        zoff + base == z_col, tl, 0)
            else:
                for zz in range(r):
                    rhs_buf[sl, zz * c:(zz + 1) * c] = jnp.where(
                        z_col == zz, f_s, 0)
            zoh = (z_col == lax.broadcasted_iota(jnp.int32, (w, r), 1)
                   ).astype(jnp.bfloat16)
            pad = lp - r * c - r
            rhs_buf[sl, r * c:] = (zoh if not pad else jnp.concatenate(
                [zoh, jnp.zeros((w, pad), jnp.bfloat16)], axis=1))

    # ft = first point tile whose span covers key tile j (-1: none). The
    # first covering tile SETS acc (no zeroing pass), later ones ADD.
    ft = ft_ref[i, j]

    @pl.when(ft < 0)
    def _():
        acc_buf[...] = jnp.zeros_like(acc_buf)

    row = lax.broadcasted_iota(jnp.int32, (rt, w), 0) + j * rt

    def contrib(t):
        keys = meta_ref[0, 0:1, t * w:(t + 1) * w]        # (1, W)
        oh = jnp.where(row == keys, 1.0, 0.0).astype(jnp.bfloat16)
        return lax.dot_general(
            oh, rhs_buf[t * w:(t + 1) * w, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for t in range(tt):
        @pl.when(t == ft)
        def _(t=t):
            acc_buf[...] = contrib(t)

        @pl.when((t > ft) & (qlo_ref[i, t] <= j) & (j <= qhi_ref[i, t]))
        def _(t=t):
            acc_buf[...] += contrib(t)

    # count divide, identical to the dense kernel
    g = acc_buf[...]
    rcp = 1.0 / jnp.maximum(g[:, r * c:r * c + r], 1.0)
    hi = rcp.astype(jnp.bfloat16)
    lo = (rcp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    zrow = lax.broadcasted_iota(jnp.int32, (r, r * c), 0)
    zlane = lax.broadcasted_iota(jnp.int32, (r, r * c), 1) // c
    e = (zrow == zlane).astype(jnp.bfloat16)
    mm = functools.partial(lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    mul = mm(hi, e) + mm(lo, e)
    out_ref[0] = (g[:, :r * c] * mul).astype(out_ref.dtype)


def binned_vox_supported(r: int, c: int, n: int, w: int = 256,
                         rt: int = 128) -> bool:
    """Measured-win + layout envelope: r >= 32 (r16 is slower than dense),
    n >= 2048 (at small point counts the dense kernel is already cheap
    and the sort/permute overhead measured 130 -> 207 us in the r5 step
    profile), lane-clean C, point count divisible into W tiles."""
    # c >= 32: the c=4 UNet-entry voxelize measured 130 -> 207 us binned
    # (permute/sort overhead vs nearly-free dense lanes)
    return (r >= 32 and n >= 2048 and c >= 32
            and (r * c) % 128 == 0 and (128 % c == 0 or c % 128 == 0)
            and n % w == 0 and (r * r) % rt == 0
            and n * ((r * c + r + 127) // 128) * 128 * 2 <= 24 * 2 ** 20)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def avg_voxelize_binned(features, vox_coords, resolution, w=256, rt=128,
                        interpret=False):
    """features (B, N, C), vox_coords (B, N, 3) int32 -> (B, R, R, R, C)."""
    b, n, c = features.shape
    r = resolution
    kt = (r * r) // rt
    tt = n // w
    lp = ((r * c + r + 127) // 128) * 128
    key = (vox_coords[..., 0] * r + vox_coords[..., 1]).astype(jnp.int32)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sk, sz, sidx = lax.sort(
        (key, vox_coords[..., 2].astype(jnp.int32), iota),
        dimension=-1, num_keys=1)
    skr = sk.reshape(b, tt, w)
    qlo = (skr[:, :, 0] // rt).astype(jnp.int32)
    qhi = (skr[:, :, -1] // rt).astype(jnp.int32)
    jj = jnp.arange(kt, dtype=jnp.int32)
    ft = jax.vmap(lambda qh: jnp.searchsorted(qh, jj, side="left"))(qhi)
    ftc = jnp.minimum(ft, tt - 1)
    valid = (ft < tt) & (jnp.take_along_axis(qlo, ftc, axis=1) <= jj[None])
    ft = jnp.where(valid, ft, -1).astype(jnp.int32)
    meta = jnp.stack([sk, sz, sidx], axis=1)          # (b, 3, n)

    out = pl.pallas_call(
        functools.partial(_vox_binned_kernel, r, w),
        out_shape=jax.ShapeDtypeStruct((b, r * r, r * c), features.dtype),
        grid=(b, kt),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, r * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, lp), jnp.bfloat16),
                        pltpu.VMEM((rt, lp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
        # feed features in their native dtype: the kernel rounds to bf16
        # for the gather dot either way, and the fp32 upcast cost ~91
        # us/step of convert fusions in the sampling chain (round 5)
    )(meta, features if features.dtype in (jnp.bfloat16, jnp.float32)
      else features.astype(jnp.float32), qlo, qhi, ft)
    return out.reshape(b, r, r, r, c)
