"""Pallas TPU kernel for trilinear devoxelization.

The XLA form does 8 corner gathers from the (r^3, C) grid per point; TPU
row gathers run at ~2% of HBM bandwidth (~3 ms per r=32 PVConv block at
batch 16). Here the gather becomes ONE MXU matmul per point tile:

    wxy (nt, r^2)  = ax (x) ay          2 nonzeros per axis -> 4 per row
    P   (nt, r*C)  = wxy @ grid.reshape(r^2, r*C)      (x,y contracted)
    out (nt, C)    = sum_z az[:, z] * P[:, z*C:(z+1)*C]  (VPU loop)

Contracting the (x, y) axes jointly gives a fully-packed K = r^2
contraction (1024 at r=32) and N = r*C output columns (2048 at C=64), vs
the old per-x-slab loop whose (nt, r^2) x (r^2, C) matmuls wasted most of
the MXU on narrow N. The z reduction is r cheap FMA slices. The grid rides
in bf16 (fp32 MXU accumulation); one (r^2, r*C) grid block stays resident
in VMEM across all point tiles of a batch item (grid dim order makes the
index map constant in the tile coordinate).

Semantics exactly match the reference (trilinear_devox.cu:21-105): floor
corners; the hi corner collapses onto lo when frac == 0 (weight 0 there,
index stays in-grid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _devox_kernel(grid_ref, coords_ref, out_ref):
    # grid_ref: (1, r^2, r*Cp) VMEM; coords_ref: (1, 3, nt) VMEM
    # out_ref: (1, nt, Cp)
    r2 = grid_ref.shape[1]
    rcp = grid_ref.shape[2]
    nt = coords_ref.shape[2]
    cp = out_ref.shape[2]
    r = r2 // (rcp // cp) if False else rcp // cp  # r = rcp / Cp
    # (r2 == r * r by construction)

    # on the bf16 path every elementwise pass (weight builds, the z
    # reduction) runs in bf16 -- 2x denser vregs, and the output is bf16
    # anyway. fp32 outputs keep the fp32 pipeline.
    #
    # Corner weights use the tent identity on the INT bin delta: with
    # d = bin - floor(c) (exact int math) and f = frac(c), the trilinear
    # weight is relu(1 - |d - f|) -- (1 - f) at d == 0, f at d == 1, 0
    # elsewhere, including the f == 0 collapse (weight 1 at the integer
    # bin). Keeping the large part integer and only f in low-precision
    # float preserves the old compare/select path's accuracy (f is
    # bf16-rounded either way) at about half the VPU passes.
    vt = jnp.bfloat16 if out_ref.dtype == jnp.bfloat16 else jnp.float32
    one = jnp.asarray(1.0, vt)

    def tent(dbin, f):
        return jnp.maximum(one - jnp.abs(dbin.astype(vt) - f), 0)

    # The block's points are processed in HALVES with all weight builds
    # and both MXU dots emitted before either z-fold: the second half's
    # VPU tent build overlaps the first half's dot, and the first fold
    # overlaps the second dot (the units scoreboard independently; one
    # monolithic build -> dot -> fold chain serializes VPU against MXU —
    # measured ~45% over the MXU bound at r=32).
    halves = 4 if nt % 4 == 0 and nt >= 2048 else (
        2 if nt % 2 == 0 and nt >= 512 else 1)
    ph = nt // halves
    # bin-index rows hoisted out of the halves loop as (1, X) rows (the
    # iota/div/mul passes at (ph, X) were ~1/3 of the weight-build VPU)
    cell1 = lax.broadcasted_iota(jnp.int32, (1, r2), 1)
    x_bin = cell1 // r
    y_bin = cell1 - x_bin * r
    zbin1 = lax.broadcasted_iota(jnp.int32, (1, rcp), 1) // cp
    ps = []
    for h in range(halves):
        sl = slice(h * ph, (h + 1) * ph)

        def parts(cc):
            lo = jnp.floor(cc)
            return (lo.astype(jnp.int32).reshape(ph, 1),
                    (cc - lo).reshape(ph, 1).astype(vt))

        xl, fx = parts(coords_ref[0, 0:1, sl])
        yl, fy = parts(coords_ref[0, 1:2, sl])

        # wxy (ph, r^2) in flat (x*r + y) lanes
        wxy = (tent(x_bin - xl, fx) * tent(y_bin - yl, fy)) \
            .astype(jnp.bfloat16)

        ps.append(jax.lax.dot_general(
            wxy, grid_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(
                jnp.bfloat16 if vt == jnp.bfloat16 else jnp.float32))

    # z-weighted reduction: out[., c] = sum_z az[., z] * P[., z*Cp + c].
    # az is expanded straight into (ph, r*Cp) lanes via the int-delta
    # tent (no sub-128-lane reshape, which Mosaic cannot lower), then the
    # z blocks fold pairwise: every fold slices at >=half-row boundaries.
    for h in range(halves):
        sl = slice(h * ph, (h + 1) * ph)
        zc = coords_ref[0, 2:3, sl]
        zlo = jnp.floor(zc)
        zl = zlo.astype(jnp.int32).reshape(ph, 1)
        fz = (zc - zlo).reshape(ph, 1).astype(vt)
        az_x = tent(zbin1 - zl, fz)
        m = ps[h].astype(vt) * az_x
        width = rcp
        while width > cp:
            width //= 2
            m = m[:, :width] + m[:, width:2 * width]
        out_ref[0, sl] = m.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def trilinear_devoxelize_pallas(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                                resolution: int) -> jnp.ndarray:
    """grid (B, R, R, R, C), norm_coords (B, N, 3) -> (B, N, C).

    Grid rides in bf16 (weights bf16 on the MXU; fp32 accumulation)."""
    r = resolution
    b, _, _, _, c = grid.shape
    n = norm_coords.shape[1]
    # point tile: per-half P results (nt x r*cp, bf16/fp32 values) + wxy
    # (nt, r^2) + resident grid block must fit the (raised) VMEM limit;
    # whole-item tiles remove the per-step sequencing overhead of the
    # (b, n//nt) grid
    pb = 2 if grid.dtype == jnp.bfloat16 else 4
    nt = min(n, 2048)
    while n % nt or (nt * r * c * pb + nt * r * r * 6 + r * r * r * c * 2
                     ) > 48 * 2 ** 20:
        nt //= 2
    # pad channels to a sublane-friendly size; z*Cp stays lane-aligned when
    # Cp is a multiple of 128 OR r*Cp fits a tile row cleanly. Pad to 128
    # only when c is not already a power-of-two >= 32 slice of 128.
    cp = c if (128 % c == 0) else ((c + 127) // 128) * 128
    grid_r = grid.reshape(b, r * r, r, c).astype(jnp.bfloat16)
    if cp != c:
        grid_r = jnp.pad(grid_r, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    grid_r = grid_r.reshape(b, r * r, r * cp)
    coords_t = jnp.transpose(norm_coords, (0, 2, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        _devox_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, cp), grid.dtype),
        grid=(b, n // nt),
        in_specs=[
            pl.BlockSpec((1, r * r, r * cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, cp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(grid_r, coords_t)
    return out if cp == c else out[..., :c]
