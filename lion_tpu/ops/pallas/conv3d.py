"""Pallas TPU kernels: 3x3x3 SAME conv over NDHWC voxel grids.

Why: the PVConv voxel branches (models/pvcnn2_ada.py:195-280 in the
reference; lion_tpu/nn/pvconv.py here) spend most of the sampling step in
3D convolutions over r=8..32 grids with 4-128 channels. XLA's direct conv
emitter runs these at 7-35 TF/s (small channel counts underfill the MXU),
and every host-side jnp.pad of an NDHWC grid with C < 128 pays the TPU
tile inflation (lane dim padded to 128: 4x HBM traffic at C=32). Both
kernels here take the UNPADDED grid and build the halo in VMEM scratch,
and both express the conv as patch-matrix matmuls with the three kd taps
packed into the matmul's N dimension:

  P ((zp+2)*H*W, 9*C)  <- nine (kh, kw)-shifted slices of a padded slab
  A ((zp+2)*H*W, 3*Cout) = P @ W2      one matmul, K=9*Cin packed
  y[p] = A[p]|kd0 + A[p+1]|kd1 + A[p+2]|kd2     (VPU adds)

- `_conv3d_pallas_fwd` (z-blocked): one grid step per batch item when the
  full depth fits VMEM (r <= 16).
- `_conv3d_pallas_planes` (per-plane ring): r = 32, where the z-blocked
  patch scratch would blow VMEM; small buffers keep the pipeline deep.

Forward-only usage in samplers is the hot path; backward falls out of
jax.custom_vjp: the VJP of a SAME 3x3x3 conv is a SAME 3x3x3 conv with
spatially-flipped, channel-transposed weights (wgrad reduces over the
batch outside).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) -> (9*Cin, 3*Cout).

    Row (kh*3+kw)*Cin + ci ; column kd*Cout + co. y[z] sums block kd of
    slab plane z+kd (padded coords), i.e. input plane z+kd-1 -- the kd-th
    z tap -- so block kd holds W[kd] directly.
    """
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    return (w.transpose(1, 2, 3, 0, 4)       # (kh, kw, ci, kd, co)
             .reshape(9 * ci, 3 * co))



def _ceil(x, m):
    return (x + m - 1) // m * m


def _zblock_vmem_est(d, h, w, c, c_out, isize=2):
    """Tiled-size VMEM estimate (bytes) for the z-blocked kernel."""
    nrow = (d + 2) * h * w
    return ((d + 2) * (h + 2) * _ceil(w + 2, 8) * _ceil(c, 128) * isize
            + _ceil(nrow, 8) * _ceil(9 * c, 128) * isize
            + _ceil(nrow, 8) * _ceil(3 * c_out, 128) * 4
            + 2 * d * h * _ceil(w, 8) * _ceil(c, 128) * isize
            + 2 * d * h * _ceil(w, 8) * _ceil(c_out, 128) * isize)


def _use_planes(d, h, w, c, c_out, isize=2):
    return d > 16 or _zblock_vmem_est(d, h, w, c, c_out, isize) > 13 * 2 ** 20


# ---------------------------------------------------------------- per-plane

def _patches_dot(plane_buf, p_buf, w2_ref, kh_range=(0, 1, 2)):
    bb, hp2, wp2, c = plane_buf.shape
    h, w = hp2 - 2, wp2 - 2
    nrow = bb * h * w
    for kh in kh_range:
        for kw in range(3):
            tap = kh * 3 + kw
            sl = plane_buf[:, kh:kh + h, kw:kw + w, :].reshape(nrow, c)
            p_buf[:, tap * c:(tap + 1) * c] = sl
    return jnp.dot(p_buf[...], w2_ref[...],
                   preferred_element_type=jnp.float32)


def _conv_kernel_planes(x_ref, x1_ref, w2_ref, out_ref, plane_buf, p_buf,
                        ring_buf):
    """One OUTPUT z-plane x BB batch items per grid step; 3-slot ring.

    The grid runs over output planes directly (not padded input planes) so
    every output block is written exactly once -- revisited output blocks
    (the old max(p-2,0) index map) serialize the Mosaic pipeline. Step p
    computes A[p+1] (via x1_ref, input plane p+1) and combines ring slots
    A[p-1], A[p], A[p+1]; step 0 additionally computes A[0] from x_ref.

    x_ref: (BB, 1, H, W, C) input plane p (used only at p == 0)
    x1_ref: (BB, 1, H, W, C) input plane min(p+1, D-1)
    w2_ref: (9*C, 3*Cout) packed weights
    out_ref: (BB, 1, H, W, Cout) output plane p
    plane_buf: (BB, H+2, W+2, C) halo scratch (borders zeroed once)
    p_buf: (BB*H*W, 9*C) patch scratch
    ring_buf: (3, BB*H*W, 3*Cout) fp32 ring: slot q%3 = A[q]

    Batching BB items into one grid step amortizes the ~2us per-step
    sequencing overhead and feeds the MXU BB x taller patch matrices.
    """
    b_idx = pl.program_id(0)
    p = pl.program_id(1)
    d = pl.num_programs(1)
    bb = out_ref.shape[0]
    h = out_ref.shape[2]
    w = out_ref.shape[3]
    c = x_ref.shape[4]
    c_out = out_ref.shape[4]
    nrow = bb * h * w

    @pl.when(jnp.logical_and(b_idx == 0, p == 0))
    def _():
        plane_buf[...] = jnp.zeros_like(plane_buf)

    # step 0: prime the ring with A[0] (A[-1] borders stay implicit zero)
    @pl.when(p == 0)
    def _():
        plane_buf[:, 1:h + 1, 1:w + 1, :] = x_ref[:, 0]
        ring_buf[0] = _patches_dot(plane_buf, p_buf, w2_ref)
        ring_buf[2] = jnp.zeros_like(ring_buf[2])        # A[-1] = 0

    # compute A[p+1] (zero beyond the top boundary)
    @pl.when(p + 1 < d)
    def _():
        plane_buf[:, 1:h + 1, 1:w + 1, :] = x1_ref[:, 0]
        ring_buf[(p + 1) % 3] = _patches_dot(plane_buf, p_buf, w2_ref)

    @pl.when(p + 1 >= d)
    def _():
        ring_buf[(p + 1) % 3] = jnp.zeros_like(ring_buf[0])

    # y[p] = A[p-1]|kd0 + A[p]|kd1 + A[p+1]|kd2
    y = (ring_buf[(p - 1) % 3][:, 0 * c_out:1 * c_out]
         + ring_buf[p % 3][:, 1 * c_out:2 * c_out]
         + ring_buf[(p + 1) % 3][:, 2 * c_out:3 * c_out])
    out_ref[:, 0] = y.reshape(bb, h, w, c_out).astype(out_ref.dtype)


def _pick_bb(b, h, wd, c, c_out, isize=2):
    """Batch items per grid step for the per-plane kernels: largest power
    of two whose scratches (tiled sizes) fit the VMEM budget. `isize` is
    the input/patch element size in bytes (bf16=2, fp32=4); the ring term
    covers both variants (4 bf16 slots fused, 3 fp32 slots plain)."""
    for bb in (8, 4, 2, 1):
        if b % bb:
            continue
        nrow = bb * h * wd
        est = (bb * (h + 2) * _ceil(wd + 2, 8) * _ceil(c, 128) * isize
               + _ceil(nrow, 8) * _ceil(9 * c, 128) * isize
               + 4 * _ceil(nrow, 8) * _ceil(3 * c_out, 128) * 3
               + 2 * bb * h * _ceil(wd, 8) * (_ceil(c, 128)
                                              + _ceil(c_out, 128)) * isize)
        if est <= 8 * 2 ** 20:
            return bb
    return 1


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _conv3d_pallas_planes(x: jnp.ndarray, w: jnp.ndarray,
                          out_dtype=jnp.bfloat16) -> jnp.ndarray:
    b, d, h, wd, c = x.shape
    c_out = w.shape[-1]
    w2 = _pack_weights(w).astype(x.dtype)
    bb = _pick_bb(b, h, wd, c, c_out, jnp.dtype(x.dtype).itemsize)

    out = pl.pallas_call(
        _conv_kernel_planes,
        grid=(b // bb, d),
        in_specs=[
            # plane 0 only (used at p == 0); constant index -> one fetch
            pl.BlockSpec((bb, 1, h, wd, c),
                         lambda bi, pp: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((bb, 1, h, wd, c),
                         lambda bi, pp: (bi, jnp.minimum(pp + 1, d - 1),
                                         0, 0, 0)),
            pl.BlockSpec((9 * c, 3 * c_out), lambda bi, pp: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, 1, h, wd, c_out),
                               lambda bi, pp: (bi, pp, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((bb * h * wd, 9 * c), x.dtype),
            pltpu.VMEM((3, bb * h * wd, 3 * c_out), jnp.float32),
        ],
    )(x, x, w2)
    return out


# ---------------------------------------------------------------- z-blocked

def _conv_kernel_zblock(x_ref, w2_ref, out_ref, slab_buf, a_buf, p_buf):
    """Full depth per grid step (one step per batch item).

    x_ref: (1, D, H, W, C) unpadded (VMEM)
    w2_ref: (9*C, 3*Cout) packed weights (VMEM)
    out_ref: (1, D, H, W, Cout) (VMEM)
    slab_buf: (D+2, H+2, W+2, C) halo scratch (borders zeroed once)
    a_buf: ((D+2)*H*W, 3*Cout) fp32 matmul result
    p_buf: ((D+2)*H*W, 9*C) patch scratch
    """
    b_idx = pl.program_id(0)
    d = out_ref.shape[1]
    h = out_ref.shape[2]
    w = out_ref.shape[3]
    c_out = out_ref.shape[4]
    c = x_ref.shape[4]
    nrow = (d + 2) * h * w

    @pl.when(b_idx == 0)
    def _():
        slab_buf[...] = jnp.zeros_like(slab_buf)

    slab_buf[1:d + 1, 1:h + 1, 1:w + 1, :] = x_ref[0]

    for kh in range(3):
        for kw in range(3):
            tap = kh * 3 + kw
            sl = slab_buf[:, kh:kh + h, kw:kw + w, :].reshape(nrow, c)
            p_buf[:, tap * c:(tap + 1) * c] = sl

    a_buf[...] = jnp.dot(p_buf[...], w2_ref[...],
                         preferred_element_type=jnp.float32)

    hw = h * w
    for p in range(d):
        y = (a_buf[p * hw:(p + 1) * hw, 0 * c_out:1 * c_out]
             + a_buf[(p + 1) * hw:(p + 2) * hw, 1 * c_out:2 * c_out]
             + a_buf[(p + 2) * hw:(p + 3) * hw, 2 * c_out:3 * c_out])
        out_ref[0, p] = y.reshape(h, w, c_out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _conv3d_pallas_fwd(x: jnp.ndarray, w: jnp.ndarray,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    b, d, h, wd, c = x.shape
    c_out = w.shape[-1]
    w2 = _pack_weights(w).astype(x.dtype)
    nrow = (d + 2) * h * wd

    out = pl.pallas_call(
        _conv_kernel_zblock,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, h, wd, c), lambda bb: (bb, 0, 0, 0, 0)),
            pl.BlockSpec((9 * c, 3 * c_out), lambda bb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, h, wd, c_out),
                               lambda bb: (bb, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, h, wd, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((d + 2, h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((nrow, 3 * c_out), jnp.float32),
            pltpu.VMEM((nrow, 9 * c), x.dtype),
        ],
    )(x, w2)
    return out


# ------------------------------------------------------------- fused (eval)

def _prologue(v, scale_row, bias_row, pre_swish):
    """Elementwise input transform applied during the halo interior copy:
    v*scale + bias (folded previous GroupNorm/AdaGN + conv bias), then
    swish. Runs on the VPU while the next block DMA is in flight."""
    if scale_row is not None:
        v = (v.astype(jnp.float32) * scale_row + bias_row)
    if pre_swish:
        v = v * jax.nn.sigmoid(v)
    return v


def _conv_kernel_planes_fused(pre_swish, want_stats, has_affine, *refs):
    """Fused per-plane kernel, TWO output planes per grid step.

    Step s emits output planes 2s and 2s+1 from ring slots A[2s-1..2s+2],
    computing A[2s+1] and A[2s+2] (priming A[0] at s=0). Halving the step
    count amortizes the ~3.5us/step pipeline base cost; every output block
    is written exactly once. Prologue affine+swish runs during the halo
    interior copy; per-channel (sum, sumsq) of the output accumulates in
    scratch and is written ONCE on the final step."""
    if has_affine:
        x0_ref, x1_ref, x2_ref, w2_ref, sc_ref, bi_ref = refs[:6]
        rest = refs[6:]
    else:
        x0_ref, x1_ref, x2_ref, w2_ref = refs[:4]
        sc_ref = bi_ref = None
        rest = refs[4:]
    if want_stats:
        out_ref, st_ref = rest[:2]
        plane_buf, p_buf, ring_buf, st_buf = rest[2:]
    else:
        out_ref = rest[0]
        st_ref = None
        plane_buf, p_buf, ring_buf = rest[1:]
        st_buf = None

    b_idx = pl.program_id(0)
    ss = pl.program_id(1)
    d = pl.num_programs(1) * 2
    bb = out_ref.shape[0]
    h = out_ref.shape[2]
    w = out_ref.shape[3]
    c = x0_ref.shape[4]
    c_out = out_ref.shape[4]
    hw = h * w

    @pl.when(jnp.logical_and(b_idx == 0, ss == 0))
    def _():
        plane_buf[...] = jnp.zeros_like(plane_buf)

    def load(ref):
        v = ref[:, 0]
        v = _prologue(
            v, None if sc_ref is None else sc_ref[:, 0][:, None, None, :],
            None if bi_ref is None else bi_ref[:, 0][:, None, None, :],
            pre_swish)
        plane_buf[:, 1:h + 1, 1:w + 1, :] = v.astype(plane_buf.dtype)

    # prime A[0]; A[-1] slot zeroed once (slot (2s-1)%4 at s=0 -> 3)
    @pl.when(ss == 0)
    def _():
        load(x0_ref)
        ring_buf[0] = _patches_dot(plane_buf, p_buf,
                                   w2_ref).astype(ring_buf.dtype)
        ring_buf[3] = jnp.zeros_like(ring_buf[3])        # A[-1] = 0

    load(x1_ref)                                         # plane 2s+1 < d
    ring_buf[(2 * ss + 1) % 4] = _patches_dot(
        plane_buf, p_buf, w2_ref).astype(ring_buf.dtype)

    @pl.when(2 * ss + 2 < d)
    def _():
        load(x2_ref)
        ring_buf[(2 * ss + 2) % 4] = _patches_dot(
            plane_buf, p_buf, w2_ref).astype(ring_buf.dtype)

    @pl.when(2 * ss + 2 >= d)
    def _():
        ring_buf[(2 * ss + 2) % 4] = jnp.zeros_like(ring_buf[0])

    a_m1 = ring_buf[(2 * ss - 1) % 4]
    a_0 = ring_buf[(2 * ss) % 4]
    a_p1 = ring_buf[(2 * ss + 1) % 4]
    a_p2 = ring_buf[(2 * ss + 2) % 4]
    y0 = (a_m1[:, 0 * c_out:1 * c_out] + a_0[:, 1 * c_out:2 * c_out]
          + a_p1[:, 2 * c_out:3 * c_out])
    y1 = (a_0[:, 0 * c_out:1 * c_out] + a_p1[:, 1 * c_out:2 * c_out]
          + a_p2[:, 2 * c_out:3 * c_out])
    out_ref[:, 0] = y0.reshape(bb, h, w, c_out).astype(out_ref.dtype)
    out_ref[:, 1] = y1.reshape(bb, h, w, c_out).astype(out_ref.dtype)

    if st_ref is not None:
        for i in range(bb):
            yi0 = y0[i * hw:(i + 1) * hw, :].astype(jnp.float32)
            yi1 = y1[i * hw:(i + 1) * hw, :].astype(jnp.float32)
            st = jnp.concatenate(
                [jnp.sum(yi0, 0, keepdims=True)
                 + jnp.sum(yi1, 0, keepdims=True),
                 jnp.sum(yi0 * yi0, 0, keepdims=True)
                 + jnp.sum(yi1 * yi1, 0, keepdims=True)], axis=0)

            @pl.when(ss == 0)
            def _(st=st, i=i):
                st_buf[i] = st

            @pl.when(ss > 0)
            def _(st=st, i=i):
                st_buf[i] += st

        @pl.when(ss == d // 2 - 1)
        def _():
            st_ref[...] = st_buf[...]


def _conv_kernel_zblock_fused(pre_swish, want_stats, has_affine, *refs):
    if has_affine:
        x_ref, w2_ref, sc_ref, bi_ref = refs[:4]
        rest = refs[4:]
    else:
        x_ref, w2_ref = refs[:2]
        sc_ref = bi_ref = None
        rest = refs[2:]
    if want_stats:
        out_ref, st_ref = rest[:2]
        slab_buf, a_buf, p_buf = rest[2:]
    else:
        out_ref = rest[0]
        st_ref = None
        slab_buf, a_buf, p_buf = rest[1:]

    b_idx = pl.program_id(0)
    d = out_ref.shape[1]
    h = out_ref.shape[2]
    w = out_ref.shape[3]
    c_out = out_ref.shape[4]
    c = x_ref.shape[4]
    nrow = (d + 2) * h * w

    @pl.when(b_idx == 0)
    def _():
        slab_buf[...] = jnp.zeros_like(slab_buf)

    v = x_ref[0]
    v = _prologue(v, None if sc_ref is None else sc_ref[0, 0],
                  None if bi_ref is None else bi_ref[0, 0], pre_swish)
    slab_buf[1:d + 1, 1:h + 1, 1:w + 1, :] = v.astype(slab_buf.dtype)

    for kh in range(3):
        for kw in range(3):
            tap = kh * 3 + kw
            sl = slab_buf[:, kh:kh + h, kw:kw + w, :].reshape(nrow, c)
            p_buf[:, tap * c:(tap + 1) * c] = sl

    a_buf[...] = jnp.dot(p_buf[...], w2_ref[...],
                         preferred_element_type=jnp.float32)

    hw = h * w
    for p in range(d):
        y = (a_buf[p * hw:(p + 1) * hw, 0 * c_out:1 * c_out]
             + a_buf[(p + 1) * hw:(p + 2) * hw, 1 * c_out:2 * c_out]
             + a_buf[(p + 2) * hw:(p + 3) * hw, 2 * c_out:3 * c_out])
        out_ref[0, p] = y.reshape(h, w, c_out).astype(out_ref.dtype)
        if st_ref is not None:
            st = jnp.concatenate([jnp.sum(y, 0, keepdims=True),
                                  jnp.sum(y * y, 0, keepdims=True)], axis=0)
            if p == 0:
                st_ref[0] = st
            else:
                st_ref[0] += st


@functools.partial(jax.jit,
                   static_argnames=("pre_swish", "want_stats", "out_dtype",
                                    "_force_pallas"))
def conv3d_3x3_fused(x: jnp.ndarray, w: jnp.ndarray, in_scale=None,
                     in_bias=None, pre_swish: bool = False,
                     want_stats: bool = False, out_dtype=None,
                     _force_pallas: bool = False):
    """Fused eval-path conv: y = conv3d(swish(x*in_scale + in_bias)), plus
    optional per-channel (sum, sum-of-squares) statistics of y over the
    spatial dims — the inputs the caller needs to fold the FOLLOWING
    GroupNorm/AdaGN/SE into per-channel affines (see nn/pvconv.py). The
    conv is bias-free: the conv bias is folded into the next norm by the
    caller. NOT differentiable — eval/sampling only.

    x (B, D, H, W, C); w (3, 3, 3, C, Cout); in_scale/in_bias (B, C).
    Returns y [, stats (B, 2, Cout) fp32].
    """
    b, d, h, wd, c = x.shape
    c_out = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    has_affine = in_scale is not None
    if not _force_pallas and (jax.default_backend() != "tpu" or h < 8):
        xx = x.astype(jnp.float32)
        if has_affine:
            xx = xx * in_scale[:, None, None, None, :] \
                + in_bias[:, None, None, None, :]
        if pre_swish:
            xx = xx * jax.nn.sigmoid(xx)
        y = lax.conv_general_dilated(
            xx.astype(x.dtype), w.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        if not want_stats:
            return y.astype(out_dtype)
        st = jnp.stack([jnp.sum(y, axis=(1, 2, 3)),
                        jnp.sum(y * y, axis=(1, 2, 3))], axis=1)
        return y.astype(out_dtype), st

    w2 = _pack_weights(w).astype(x.dtype)
    isize = jnp.dtype(x.dtype).itemsize
    planes = _use_planes(d, h, wd, c, c_out, isize)
    nrow = (d + 2) * h * wd

    bbk = _pick_bb(b, h, wd, c, c_out, isize) if planes else 1
    if planes:
        in_specs = [
            # plane 0 only (used at s == 0); constant index -> one fetch
            pl.BlockSpec((bbk, 1, h, wd, c),
                         lambda bi, ss: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((bbk, 1, h, wd, c),
                         lambda bi, ss: (bi, 2 * ss + 1, 0, 0, 0)),
            pl.BlockSpec((bbk, 1, h, wd, c),
                         lambda bi, ss: (bi, jnp.minimum(2 * ss + 2, d - 1),
                                         0, 0, 0)),
            pl.BlockSpec((9 * c, 3 * c_out), lambda bi, ss: (0, 0)),
        ]
        args = [x, x, x, w2]
    else:
        in_specs = [
            pl.BlockSpec((1, d, h, wd, c), lambda bi: (bi, 0, 0, 0, 0)),
            pl.BlockSpec((9 * c, 3 * c_out), lambda bi: (0, 0)),
        ]
        args = [x, w2]
    if has_affine:
        if planes:
            in_specs += [pl.BlockSpec((bbk, 1, c),
                                      lambda bi, ss: (bi, 0, 0))] * 2
        else:
            in_specs += [pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0))] * 2
        args += [in_scale.astype(jnp.float32)[:, None, :],
                 in_bias.astype(jnp.float32)[:, None, :]]

    if planes:
        out_specs = [pl.BlockSpec((bbk, 2, h, wd, c_out),
                                  lambda bi, ss: (bi, ss, 0, 0, 0))]
    else:
        out_specs = [pl.BlockSpec((1, d, h, wd, c_out),
                                  lambda bi: (bi, 0, 0, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, d, h, wd, c_out), out_dtype)]
    if want_stats:
        if planes:
            out_specs.append(pl.BlockSpec((bbk, 2, c_out),
                                          lambda bi, ss: (bi, 0, 0)))
        else:
            out_specs.append(pl.BlockSpec((1, 2, c_out),
                                          lambda bi: (bi, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b, 2, c_out), jnp.float32))

    if planes:
        assert d % 2 == 0
        kern = functools.partial(_conv_kernel_planes_fused, pre_swish,
                                 want_stats, has_affine)
        grid = (b // bbk, d // 2)
        scratch = [pltpu.VMEM((bbk, h + 2, wd + 2, c), x.dtype),
                   pltpu.VMEM((bbk * h * wd, 9 * c), x.dtype),
                   # bf16 ring: the 3-term kd combine is cast to bf16 at
                   # the output anyway; fp32 would double the largest
                   # scratch and force bb=1
                   pltpu.VMEM((4, bbk * h * wd, 3 * c_out), jnp.bfloat16)]
        if want_stats:
            scratch.append(pltpu.VMEM((bbk, 2, c_out), jnp.float32))
    else:
        kern = functools.partial(_conv_kernel_zblock_fused, pre_swish,
                                 want_stats, has_affine)
        grid = (b,)
        scratch = [pltpu.VMEM((d + 2, h + 2, wd + 2, c), x.dtype),
                   pltpu.VMEM((nrow, 3 * c_out), jnp.float32),
                   pltpu.VMEM((nrow, 9 * c), x.dtype)]

    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch,
    )(*args)
    return out if want_stats else out[0]


# ---------------------------------------------------------------- dispatch

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_3x3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 SAME conv, NDHWC x (3,3,3,Cin,Cout) -> NDHWC, bias-free.

    TPU: pad-free Pallas kernels (above). Elsewhere: XLA direct conv.
    Output dtype follows x.
    """
    return _conv3d_impl(x, w)


def _conv3d_impl(x, w):
    if jax.default_backend() == "tpu" and x.shape[2] >= 8:
        b, d, h, wd, c = x.shape
        if _use_planes(d, h, wd, c, w.shape[-1],
                       jnp.dtype(x.dtype).itemsize):
            # z-blocked patch scratch blows VMEM (r=32, or big channel
            # counts); the small-buffer per-plane ring pipelines best
            return _conv3d_pallas_planes(x, w, out_dtype=x.dtype)
        return _conv3d_pallas_fwd(x, w, out_dtype=x.dtype)
    return _conv3d_xla(x, w)


def _conv3d_xla(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _conv3d_fwd(x, w):
    return _conv3d_impl(x, w), (x, w)


def _conv3d_bwd(res, g):
    x, w = res
    # dL/dx: conv with flipped kernel, in/out channels swapped
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3d_impl(g, w_flip.astype(g.dtype)).astype(x.dtype)
    # dL/dw: correlate input with output grads (fp32; training-path only)
    dw = lax.conv_general_dilated(
        x.transpose(4, 1, 2, 3, 0).astype(jnp.float32),   # Cin as batch
        g.transpose(1, 2, 3, 0, 4).astype(jnp.float32),   # B as in-feature
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).transpose(1, 2, 3, 0, 4).astype(w.dtype)  # (3,3,3,Cin,Cout)
    return dx, dw


conv3d_3x3_same.defvjp(_conv3d_fwd, _conv3d_bwd)
