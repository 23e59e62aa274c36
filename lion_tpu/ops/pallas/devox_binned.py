"""Point-binned trilinear devoxelization — Pallas TPU kernel (v2 form).

The dense kernel (devox.py) pays N * r^2 * (r*Cp) MACs per item in one
big wxy @ grid dot. Binning the points by floor-xy key (one XLA lax.sort)
makes each W-point tile's covered key window [qlo, qhi] CONTIGUOUS, so
ONE dot with a static K = KW*rt window at dynamic row offset qlo*rt
covers it whenever the span fits KW tiles — tent weights are exactly
zero for non-adjacent cells, so over-covering is harmless. The dot result
stays a VALUE (bf16 on the bf16 path) that is z-folded in place: no
accumulator scratch round-trips (the v1 gated-accumulate form measured
SLOWER than dense for exactly that reason; scripts/exp_binned_voxdevox.py
keeps both for the record). The window start is CLAMPED to kt - KW so the
dynamic slice never leaves the grid (shifting the window down only adds
zero-weight rows — no row padding, whose XLA copy measured 128 us/step);
spans wider than KW tiles (pathological point spreads, never hit by
gauss/uniform/plane distributions at N = 2048, r = 32) drain through a
gated spill loop into a tiny (W, Cp) scratch.

Measured on v5e (B = 16, N = 2048, round 5): 932 -> 858 us/call at
r32/C32, 1515 -> 1290 at r32/C64, sort + unpermute included; r = 16
measures slower than dense, so dispatch gates on r >= 32.

Semantics exactly match the reference (trilinear_devox.cu:21-105): floor
corners, hi corner collapsing onto lo at frac == 0. Backward replays the
XLA gather form via lion_tpu.ops.voxel's custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KW = 3  # static key-tile window per point tile


def _devox_binned_kernel(r, w, kt, grid_ref, scoords_ref, pos_ref,
                         qlo_ref, qhi_ref, out_ref, osort_buf, spill_buf):
    # grid_ref (1, r^2, r*Cp) bf16; scoords (1, 3, N) SORTED
    # pos_ref (1, 1, N) int32 inverse perm; out_ref (1, N, Cp)
    # osort_buf (N, Cp); spill_buf (W, Cp) fp32
    rcp = grid_ref.shape[2]
    n = scoords_ref.shape[2]
    cp = out_ref.shape[2]
    rt = (r * r) // kt
    kw = _KW * rt
    tt = n // w
    i = pl.program_id(0)
    vt = jnp.bfloat16 if out_ref.dtype == jnp.bfloat16 else jnp.float32
    one = jnp.asarray(1.0, vt)

    def tent(dbin, f):
        return jnp.maximum(one - jnp.abs(dbin.astype(vt) - f), 0)

    zbin1 = lax.broadcasted_iota(jnp.int32, (1, rcp), 1) // cp

    def parts(cc):
        lo = jnp.floor(cc)
        return (lo.astype(jnp.int32).reshape(w, 1),
                (cc - lo).reshape(w, 1).astype(vt))

    def fold_z(p, az):
        m = p.astype(vt) * az
        width = rcp
        while width > cp:
            width //= 2
            m = m[:, :width] + m[:, width:2 * width]
        return m

    for t in range(tt):
        sl = slice(t * w, (t + 1) * w)
        xl, fx = parts(scoords_ref[0, 0:1, sl])
        yl, fy = parts(scoords_ref[0, 1:2, sl])
        zl, fz = parts(scoords_ref[0, 2:3, sl])
        az = tent(zbin1 - zl, fz)
        # clamp: window never leaves the grid; down-shift adds only
        # zero-weight rows (tents vanish off the true span)
        qlo = jnp.minimum(qlo_ref[i, t], kt - _KW)
        qhi = qhi_ref[i, t]

        # main window: one dot over KW key tiles starting at qlo*rt
        col = lax.broadcasted_iota(jnp.int32, (w, kw), 1) + qlo * rt
        xb = col // r
        yb = col - xb * r
        wxy = (tent(xb - xl, fx) * tent(yb - yl, fy)).astype(jnp.bfloat16)
        d = lax.dot_general(
            wxy, grid_ref[0, pl.ds(qlo * rt, kw), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m = fold_z(d, az)

        # rare spill: key tiles beyond the window, folded tile by tile
        spilled = qhi >= qlo + _KW

        @pl.when(spilled)
        def _():
            spill_buf[...] = jnp.zeros_like(spill_buf)
            for j in range(_KW, kt):
                @pl.when((qlo + j < kt) & (j <= qhi - qlo))
                def _(j=j):
                    colj = (lax.broadcasted_iota(jnp.int32, (w, rt), 1)
                            + (qlo + j) * rt)
                    xbj = colj // r
                    ybj = colj - xbj * r
                    wj = (tent(xbj - xl, fx) * tent(ybj - yl, fy)
                          ).astype(jnp.bfloat16)
                    dj = lax.dot_general(
                        wj, grid_ref[0, pl.ds((qlo + j) * rt, rt), :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    spill_buf[...] += fold_z(dj, az).astype(jnp.float32)

        m = jnp.where(spilled, m + spill_buf[...].astype(vt), m)
        osort_buf[sl, :] = m.astype(osort_buf.dtype)

    # unpermute: out[orig] = osort[pos[orig]] via one-hot gather dots
    iota_n = lax.broadcasted_iota(jnp.int32, (w, n), 1)
    odt = jnp.bfloat16 if vt == jnp.bfloat16 else jnp.float32
    for t in range(tt):
        sl = slice(t * w, (t + 1) * w)
        pos_t = pos_ref[0, 0:1, sl].reshape(w, 1)
        oh = (pos_t == iota_n).astype(odt)
        o = lax.dot_general(oh, osort_buf[...].astype(odt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        out_ref[0, sl, :] = o.astype(out_ref.dtype)


def binned_devox_supported(r: int, c: int, n: int, w: int = 256,
                           rt: int = 128) -> bool:
    """Measured-win + layout envelope (r16 loses to dense; see header)."""
    cp = c if (128 % c == 0) else ((c + 127) // 128) * 128
    # n >= 2048: at smaller point counts the dense kernel is cheap and
    # the sort/unpermute overhead measures as a regression (r4/r5 step
    # profiles); kt >= KW keeps the clamped window well-defined
    return (r >= 32 and n % w == 0 and n >= 2048 and (r * r) % rt == 0
            and (r * r) // rt >= _KW
            and r * r * r * cp * 2 <= 24 * 2 ** 20)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def trilinear_devoxelize_binned(grid, norm_coords, resolution, w=256,
                                rt=128, interpret=False):
    """grid (B, R, R, R, C), norm_coords (B, N, 3) float -> (B, N, C)."""
    r = resolution
    b, _, _, _, c = grid.shape
    n = norm_coords.shape[1]
    kt = (r * r) // rt
    tt = n // w
    cp = c if (128 % c == 0) else ((c + 127) // 128) * 128
    x = norm_coords[..., 0].astype(jnp.float32)
    y = norm_coords[..., 1].astype(jnp.float32)
    z = norm_coords[..., 2].astype(jnp.float32)
    key = (jnp.floor(x).astype(jnp.int32) * r
           + jnp.floor(y).astype(jnp.int32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sk, sx, sy, sz, sidx = lax.sort((key, x, y, z, iota),
                                    dimension=-1, num_keys=1)
    _, pos = lax.sort((sidx, iota), dimension=-1, num_keys=1)
    skr = sk.reshape(b, tt, w)
    qlo = (skr[:, :, 0] // rt).astype(jnp.int32)
    # the hi corner reaches key + r + 1
    qhi = jnp.minimum((skr[:, :, -1] + r + 1) // rt, kt - 1).astype(jnp.int32)
    scoords = jnp.stack([sx, sy, sz], axis=1)         # (b, 3, n)

    grid_r = grid.reshape(b, r * r, r, c).astype(jnp.bfloat16)
    if cp != c:
        grid_r = jnp.pad(grid_r, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    grid_r = grid_r.reshape(b, r * r, r * cp)

    out = pl.pallas_call(
        functools.partial(_devox_binned_kernel, r, w, kt),
        out_shape=jax.ShapeDtypeStruct((b, n, cp), grid.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r * r, r * cp),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, cp),
                       jnp.bfloat16 if grid.dtype == jnp.bfloat16
                       else jnp.float32),
            pltpu.VMEM((w, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(grid_r, scoords, pos[:, None, :], qlo, qhi)
    return out if cp == c else out[..., :c]
