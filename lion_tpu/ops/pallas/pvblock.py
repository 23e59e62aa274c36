"""Pallas TPU megafused PVConv voxel branch (sampling path).

ONE kernel per batch item runs the whole voxel pipeline of a PVConv block
at r=32 / C=64 (the FP3 hot shape, ~8 ms/step of the 20 ms local-prior
denoise step):

    voxelize -> conv0 -> GN/AdaGN fold -> swish -> conv1 -> devoxelize
      (one-hot   (banded   (in-kernel     (VPU)   (banded    (corner
       MXU dot)   MXU)      stats)                 MXU)       MXU dot)

vs the 3-kernel chain (avg_voxelize_pallas -> conv3d_packed_pair ->
trilinear_devoxelize_pallas) this removes two HBM round trips of the
(R^2, R*C) grid and — the real win — gives Mosaic one scheduling window
across all stages, so the VPU stage work (one-hot builds, slab shifts,
z-folds, stat folds) pipelines under the MXU dots of the neighbouring
stages instead of serializing per kernel.

Component semantics are IDENTICAL to the standalone kernels (every stage
is the same code path or a verbatim port):
  - voxelize: ops/pallas/voxelize.py one-hot matmul with in-dot counts
    (reference vox.cu:18-72 scatter-mean)
  - conv pair: ops/pallas/conv3d_packed.py _conv_kernel_pair (reference
    Conv3d k3 SAME + GroupNorm/AdaGN fold, models/pvcnn2_ada.py:195-280)
  - devoxelize: ops/pallas/devox.py tent-weight matmul + z-fold
    (reference trilinear_devox.cu:21-105)
Returns the devoxelized points and conv1's raw (sum, sumsq) stats; the
caller folds the post-conv1 norm/SE into a per-point affine exactly like
the unfused path (norm commutes with devoxelization). NOT differentiable;
sampling only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d_packed import (_block_stats, _fill_shifts, _fold_stats_lanes,
                            _item_block_dots, _pair_vmem_bytes,
                            pack_weights_item, supports_packed)


def block_pair_feasible(r: int, ci: int, co: int, n: int,
                        itemsize: int = 2) -> bool:
    """Shapes the megafused kernel can COMPILE for: any equal-channel
    packed-layout conv shape with whole-item point tiles that fit VMEM.
    bf16 activations only (fp32 doubles the slabs past the VMEM limit)."""
    return (supports_packed(r, ci, co) and itemsize == 2
            and n % 8 == 0 and n <= 4096
            and block_vmem_bytes(r, ci, n) <= 100 * 2 ** 20)


# shapes where the megafused block MEASURES faster than the 3-kernel
# chain on v5e (scripts/bench_pvblock_shapes.py, batch 16): (r, c) pairs.
# r8/c128 (FP0/FP1) +255us/+14us (dispatch-bound at small N). r32/c64
# (FP3) was here through round 4 (+419us vs the DENSE chain), but the
# round-5 point-binned vox/devox beat the fused block's internal dense
# one-hot stages: [binned vox -> packed conv pair -> binned devox v2]
# measured 17.32 -> 16.49 ms/step on the full sampling loop
# (scripts/profile_local_step.py, LION_MEGAFUSE_3264 re-enables for A/B).
# Other losers kept on the chain: r32/c32 -142us (g=4 edge-slab VPU),
# r16/c128 -104us (M=256 dots too short to hide the serial stages).
_BLOCK_PAIR_WINS = {(8, 128)}


def supports_block_pair(r: int, ci: int, co: int, n: int,
                        itemsize: int = 2) -> bool:
    """Dispatch gate: feasible AND measured faster than the chain."""
    import os
    wins = _BLOCK_PAIR_WINS
    if os.environ.get("LION_MEGAFUSE_3264") == "1":
        wins = wins | {(32, 64)}
    return (block_pair_feasible(r, ci, co, n, itemsize)
            and (r, ci) in wins)


def _block_kernel(r, ci, g, ng, n, lp, *refs):
    r2 = r * r
    rc = ng * 128
    nw = 3 if g in (1, 4) else 2
    feats_ref, icoords_ref, fcoords_ref = refs[:3]
    w0 = refs[3:3 + nw]
    w1 = refs[3 + nw:3 + 2 * nw]
    b0_ref, ca_ref, cb_ref = refs[3 + 2 * nw:6 + 2 * nw]
    out_ref, st_ref = refs[6 + 2 * nw:8 + 2 * nw]
    bufs = refs[8 + 2 * nw:]
    if g == 1:
        rhs_buf, y_buf, y0_buf, y1_buf = bufs
        ey_buf = None
        wm0, wp0, wn0 = w0
        we0 = None
        wm1, wp1, wn1 = w1
        we1 = None
    elif g == 4:
        rhs_buf, y_buf, epm_buf, e0_buf, y0_buf, y1_buf = bufs
        ey_buf = (epm_buf, e0_buf)
        wm0, we0 = w0[0], (w0[1], w0[2])
        wm1, we1 = w1[0], (w1[1], w1[2])
        wp0 = wn0 = wp1 = wn1 = None
    else:
        rhs_buf, y_buf, ey_buf, y0_buf, y1_buf = bufs
        wm0, we0 = w0
        wm1, we1 = w1
        wp0 = wn0 = wp1 = wn1 = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        y_buf[:, :r] = jnp.zeros_like(y_buf[:, :r])
        y_buf[:, r + r2:] = jnp.zeros_like(y_buf[:, r + r2:])
        if g == 4:
            for eb in ey_buf:
                eb[:r] = jnp.zeros_like(eb[:r])
                eb[r + r2:] = jnp.zeros_like(eb[r + r2:])
        elif ey_buf is not None:
            ey_buf[:, :r] = jnp.zeros_like(ey_buf[:, :r])
            ey_buf[:, r + r2:] = jnp.zeros_like(ey_buf[:, r + r2:])

    # ---- stage 0: devox weight builds, hoisted to the top -----------
    # (pure functions of the coords inputs: issuing them first lets the
    # VPU tent/one-hot builds overlap the stage-1/2 MXU dots instead of
    # serializing between conv1 and the devox dot)
    vt = jnp.bfloat16 if out_ref.dtype == jnp.bfloat16 else jnp.float32
    one = jnp.asarray(1.0, vt)

    def parts(cc):
        lo2 = jnp.floor(cc)
        return (lo2.astype(jnp.int32).reshape(n, 1),
                (cc - lo2).reshape(n, 1).astype(vt))

    xl, fx = parts(fcoords_ref[0, 0:1, :])
    yl, fy = parts(fcoords_ref[0, 1:2, :])
    zl, fz = parts(fcoords_ref[0, 2:3, :])

    def tent(dbin, fr):
        return jnp.maximum(one - jnp.abs(dbin.astype(vt) - fr), 0)

    cell = lax.broadcasted_iota(jnp.int32, (n, r2), 1)
    x_bin = cell // r
    y_bin = cell - x_bin * r
    wxy = (tent(x_bin - xl, fx) * tent(y_bin - yl, fy)).astype(jnp.bfloat16)

    # ---- stage 1: voxelize (ops/pallas/voxelize.py _vox_kernel port) ----
    z_col = icoords_ref[0, 2:3, :].reshape(n, 1)          # (N, 1) int32
    f = feats_ref[0].astype(jnp.bfloat16)                 # (N, C)
    chunk = max(1, min(r, 128 // ci))
    cw = chunk * ci
    if chunk > 1:
        t = f
        while t.shape[1] < cw:
            t = jnp.concatenate([t, t], axis=1)
        zoff = lax.broadcasted_iota(jnp.int32, (n, cw), 1) // ci
        for base in range(0, r, chunk):
            rhs_buf[:, base * ci:base * ci + cw] = jnp.where(
                zoff + base == z_col, t, 0)
    else:
        for z in range(r):
            rhs_buf[:, z * ci:(z + 1) * ci] = jnp.where(z_col == z, f, 0)
    zoh = (z_col == lax.broadcasted_iota(jnp.int32, (n, r), 1)
           ).astype(jnp.bfloat16)
    pad = lp - rc - r
    rhs_buf[:, rc:] = (zoh if not pad else jnp.concatenate(
        [zoh, jnp.zeros((n, pad), jnp.bfloat16)], axis=1))

    xy_n = icoords_ref[0, 0:1, :] * r + icoords_ref[0, 1:2, :]   # (1, N)
    row = lax.broadcasted_iota(jnp.int32, (r2, n), 0)
    onehot = jnp.where(row == xy_n, 1.0, 0.0).astype(jnp.bfloat16)
    gsum = jax.lax.dot_general(
        onehot, rhs_buf[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (r2, lp)
    rcp = 1.0 / jnp.maximum(gsum[:, rc:rc + r], 1.0)      # (r2, r)
    zrow = lax.broadcasted_iota(jnp.int32, (r, rc), 0)
    zlane = lax.broadcasted_iota(jnp.int32, (r, rc), 1) // ci
    e = (zrow == zlane).astype(jnp.bfloat16)
    hi = rcp.astype(jnp.bfloat16)
    lo = (rcp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mmf = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mul = mmf(hi, e) + mmf(lo, e)                         # (r2, rc)
    xp = (gsum[:, :rc] * mul).astype(y_buf.dtype)         # packed grid

    # ---- stage 2: conv0 (VMEM only) -------------------------------------
    _fill_shifts(r, r2, rc, ci, g, xp, y_buf, ey_buf)

    st0_parts = []

    def write0(gg, lo_, acc):
        yb = acc.astype(y0_buf.dtype)
        y0_buf[:, lo_:lo_ + 128] = yb
        st0_parts.append(_block_stats(yb))

    _item_block_dots(r, r2, g, ng, y_buf, ey_buf, wm0, wp0, wn0, we0,
                     write0)

    # ---- stage 3: GN/AdaGN fold (conv3d_packed.py _conv_kernel_pair) ----
    st0 = _fold_stats_lanes(jnp.concatenate(st0_parts, axis=1), rc, ci)
    count = float(r) ** 3
    b0 = b0_ref[0, 0]
    s1 = st0[0:1]
    s2 = st0[1:2]
    mean_c = s1 / count + b0
    ex2_c = s2 / count + 2.0 * b0 * (s1 / count) + b0 * b0
    cg = ci // 8
    gi_ = lax.broadcasted_iota(jnp.int32, (ci, ci), 0) // cg
    gj_ = lax.broadcasted_iota(jnp.int32, (ci, ci), 1) // cg
    gmap = jnp.where(gi_ == gj_, 1.0 / cg, 0.0).astype(jnp.float32)
    mu_c = mmf(mean_c, gmap)
    gex2 = mmf(ex2_c, gmap)
    gvar = jnp.maximum(gex2 - mu_c * mu_c, 0.0)
    rs_c = jax.lax.rsqrt(gvar + 1e-5)
    sc = rs_c * ca_ref[0, 0]
    bi = (b0 - mu_c) * rs_c * ca_ref[0, 0] + cb_ref[0, 0]
    while sc.shape[1] < rc:
        sc = jnp.concatenate([sc, sc], axis=1)
        bi = jnp.concatenate([bi, bi], axis=1)

    # ---- stage 4: swish + conv1 -----------------------------------------
    vf = y0_buf[...].astype(jnp.float32) * sc + bi
    vf = vf * jax.nn.sigmoid(vf)
    _fill_shifts(r, r2, rc, ci, g, vf.astype(y_buf.dtype), y_buf, ey_buf)

    st1_parts = []

    def write1(gg, lo_, acc):
        yb = acc.astype(y1_buf.dtype)
        y1_buf[:, lo_:lo_ + 128] = yb
        st1_parts.append(_block_stats(yb))

    _item_block_dots(r, r2, g, ng, y_buf, ey_buf, wm1, wp1, wn1, we1,
                     write1)
    st_ref[...] = _fold_stats_lanes(jnp.concatenate(st1_parts, axis=1),
                                    rc, ci)[None]

    # ---- stage 5: devoxelize (ops/pallas/devox.py _devox_kernel port;
    #      weight builds hoisted to stage 0). Points processed in halves
    #      with both dots emitted before either z-fold so the folds
    #      overlap the second dot (same interleave as the standalone
    #      devox kernel, measured r4) ---------------------------------
    halves = 4 if n % 4 == 0 and n >= 2048 else (
        2 if n % 2 == 0 and n >= 512 else 1)
    phn = n // halves
    ps = []
    for h in range(halves):
        ps.append(jax.lax.dot_general(
            wxy[h * phn:(h + 1) * phn], y1_buf[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))          # (phn, rc)
    col = lax.broadcasted_iota(jnp.int32, (phn, rc), 1)
    zbin = col // ci
    for h in range(halves):
        sl = slice(h * phn, (h + 1) * phn)
        m = ps[h].astype(vt) * tent(zbin - zl[sl], fz[sl])
        width = rc
        while width > ci:
            width //= 2
            m = m[:, :width] + m[:, width:2 * width]
        out_ref[0, sl] = m.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def pvconv_block_pair(features: jnp.ndarray, vox_coords: jnp.ndarray,
                      norm_coords: jnp.ndarray, w0: jnp.ndarray,
                      b0: jnp.ndarray, ca0: jnp.ndarray, cb0: jnp.ndarray,
                      w1: jnp.ndarray, r: int, interpret: bool = False):
    """features (B, N, C), vox_coords (B, N, 3) int32, norm_coords
    (B, N, 3) float in [0, r-1]; w0/w1 (3,3,3,C,C); b0 (C,) conv0 bias;
    ca0/cb0 (B, C) post-GN channel affine. Returns (points (B, N, C),
    st1 (B, 2, C) fp32) == trilinear_devoxelize(conv_pair(avg_voxelize(
    features))) of the standalone kernels."""
    b, n, c = features.shape
    # interpret mode (CPU parity tests) has no VMEM constraint
    itemsize = 2 if interpret else jnp.dtype(features.dtype).itemsize
    assert block_pair_feasible(r, c, c, n, itemsize), \
        (r, c, n, features.dtype)
    g = 128 // c
    ng = (r * c) // 128
    lp = ((r * c + r + 127) // 128) * 128
    ws0 = tuple(x.astype(features.dtype)
                for x in pack_weights_item(w0.astype(jnp.float32), g))
    ws1 = tuple(x.astype(features.dtype)
                for x in pack_weights_item(w1.astype(jnp.float32), g))

    icoords = jnp.transpose(vox_coords, (0, 2, 1)).astype(jnp.int32)
    fcoords = jnp.transpose(norm_coords, (0, 2, 1)).astype(jnp.float32)

    in_specs = ([pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0)),
                 pl.BlockSpec((1, 3, n), lambda bi: (bi, 0, 0)),
                 pl.BlockSpec((1, 3, n), lambda bi: (bi, 0, 0))]
                + [pl.BlockSpec(w_.shape, lambda bi: (0, 0))
                   for w_ in (*ws0, *ws1)]
                + [pl.BlockSpec((1, 1, c), lambda bi: (0, 0, 0)),
                   pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0)),
                   pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0))])
    args = [features, icoords, fcoords, *ws0, *ws1,
            b0.astype(jnp.float32).reshape(1, 1, c),
            ca0.astype(jnp.float32)[:, None, :],
            cb0.astype(jnp.float32)[:, None, :]]
    out_specs = [pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0)),
                 pl.BlockSpec((1, 2, c), lambda bi: (bi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, n, c), features.dtype),
                  jax.ShapeDtypeStruct((b, 2, c), jnp.float32)]
    rc = r * c
    r2 = r * r
    scratch = [pltpu.VMEM((n, lp), jnp.bfloat16),              # vox rhs
               pltpu.VMEM((3, r + r2 + r, rc), features.dtype)]  # y_buf
    if g == 4:
        scratch += [pltpu.VMEM((r + r2 + r, rc), features.dtype),  # epm
                    pltpu.VMEM((r + r2 + r, rc), features.dtype)]  # e0
    elif g > 1:
        scratch.append(pltpu.VMEM((3, r + r2 + r, rc), features.dtype))
    scratch += [pltpu.VMEM((r2, rc), features.dtype),          # y0
                pltpu.VMEM((r2, rc), features.dtype)]          # y1

    kern = functools.partial(_block_kernel, r, c, g, ng, n, lp)
    pts, st1 = pl.pallas_call(
        kern, grid=(b,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20),
    )(*args)
    return pts, st1


def block_vmem_bytes(r, ci, n):
    lp = ((r * ci + r + 127) // 128) * 128
    return (_pair_vmem_bytes(r, ci, dual_slabs=False) + n * lp * 2
            + (r * r) * (r * ci) * 2
            + n * (r * r) * 2 + n * r * ci * 4)
