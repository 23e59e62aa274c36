"""Pallas TPU kernel: 3x3x3 SAME conv in the PACKED voxel layout.

The r=32 PVConv stages dominate the sampling step. The 5D NDHWC kernels
(conv3d.py) pay twice for small channel counts: every (kh, kw) patch
slice moves C<128 lanes (4x register waste at C=32), and the 5D grids
tile-inflate in HBM, forcing the (B, R^2, R*C) <-> NDHWC retiling passes
that show up as ~2.1 ms/step of standalone reshapes.

This kernel consumes and produces the layout voxelize natively emits --
rows = s0*R + s1, lanes = s2*C + c (which reshapes to NDHWC row-major) --
so the whole r=32 voxel pipeline (voxelize -> conv0 -> conv1 ->
devoxelize) runs with zero retiling. With C in {32, 64, 128}, one
128-lane block holds G = 128//C planes of the lane-packed spatial dim
s2, and the kernel emits one OUTPUT lane-block per grid step:

  y_buf (3, R + R^2 + R, 128)  the three s1-shifts of the prologued
        input block (wrapped rows masked), with R zero guard rows on
        both ends; the s0 taps then become R-row-aligned slices -- all
        nine (t0, t1) tap copies are relayout-free dense 128-lane moves
  P     (R^2, Kext) = [9 taps x block | 9 taps x (prev-edge ++ next-edge
        s2 planes)] -- the s2 taps crossing the lane-block boundary ride
        two extracted neighbor planes processed as ONE combined pipeline
  Y     = P @ Wext   ONE matmul; Wext's banded block structure encodes
        the s2 taps (zi -> zo valid iff |zi - zo| <= 1)
  stats via the MXU: sum = ones @ Y, sumsq = diag(Y^T Y) -- no VPU
        cross-sublane reductions in the hot loop

The matmul pays K = 9*128 (+ edges) per 128 output lanes; at N <= 128
MXU time scales with M*K, so the inflation over true conv MACs is
(G+2)/3 -- 1.33x at C=64, 2x at C=32 -- against near-zero relayout cost,
vs the 5D kernels' ~4x patch-relayout overhead.

Semantics identical to conv3d_3x3_same + fused affine/swish/stats
(reference Conv3d k3 SAME, models/pvcnn2_ada.py:195-280). Eval-only:
sampling path; training uses the XLA conv via nn/common.TConv3d.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil(x, m):
    return (x + m - 1) // m * m


def supports_packed(r: int, ci: int, co: int) -> bool:
    """Shapes the lane-block kernel handles: equal 128-divisor channel
    counts and a resolution whose plane count fills whole lane blocks.
    r >= 8 covers the SA2/FP0/FP1 C=128 stages (measured faster than the
    5D kernel at r=8 too)."""
    return (ci == co and ci in (32, 64, 128) and r >= 8
            and (r * ci) % 128 == 0 and r % max(1, 128 // ci) == 0)


def supports_packed_small(r: int, ci: int, co: int) -> bool:
    """Shapes the single-block kernel handles: the whole s2 extent fits
    ONE 128-lane block (r*ci == 128), e.g. the SA0 entry conv (Ci=4,
    r=32). Output width r*co must tile into lane blocks."""
    return (r * ci == 128 and (r * co) % 128 == 0 and 128 % ci == 0
            and r >= 8)


def pack_weights_ext(w: jnp.ndarray, g: int) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (Kext, g*Co) for lane-groups of g planes.

    Rows: tap-major main block [tap*128 + zi*Ci + ci] over the g in-block
    s2 planes, then the combined edge group [KMAIN + tap*2Ci + {prev: ci,
    next: Ci + ci}] (prev-edge: s2 tap kd=0 into zo=0; next-edge: kd=2
    into zo=g-1), padded to a 128 multiple. Columns: zo*Co + co. Pure
    vectorized ops so XLA hoists the packing out of sampling scans.
    """
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3) and g * ci == 128 and ci == co
    kedge = _ceil(18 * ci, 128)
    # rows/lanes split: rows carry spatial dims (s0, s1), lanes pack the
    # LAST spatial dim s2 with channels -> band over t2, taps = (t0, t1)
    wt = jnp.transpose(w, (2, 0, 1, 3, 4)).reshape(3, 9, ci, co)
    # band[kd, zi, zo] = 1 iff zi - zo == kd - 1
    band = jnp.stack([jnp.eye(g, k=-(k - 1), dtype=w.dtype)
                      for k in range(3)])
    wmain = jnp.einsum("ktio,kzy->tziyo", wt, band)  # (tap, zi, ci, zo, co)
    wmain = wmain.reshape(9 * g * ci, g * co)        # (1152, 128)

    zpad = jnp.zeros((9, ci, g - 1, co), w.dtype) if g > 1 else None
    wprev = wt[0].reshape(9, ci, 1, co)              # kd=0 -> zo=0
    wnext = wt[2].reshape(9, ci, 1, co)              # kd=2 -> zo=g-1
    if g > 1:
        wprev = jnp.concatenate([wprev, zpad], axis=2)
        wnext = jnp.concatenate([zpad, wnext], axis=2)
    wedge = jnp.concatenate([wprev.reshape(9, ci, g * co),
                             wnext.reshape(9, ci, g * co)], axis=1)
    wedge = wedge.reshape(18 * ci, g * co)
    rpad = kedge - 18 * ci
    if rpad:
        wedge = jnp.concatenate(
            [wedge, jnp.zeros((rpad, g * co), w.dtype)], axis=0)
    return jnp.concatenate([wmain, wedge], axis=0)


def pack_weights_small(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) with R*Ci == 128 -> (9*128, R*Co): one banded weight
    over ALL R s2-planes (single lane block, no edge groups; the s2
    borders are zeros of the band)."""
    kd, kh, kw, ci, co = w.shape
    r = 128 // ci
    wt = jnp.transpose(w, (2, 0, 1, 3, 4)).reshape(3, 9, ci, co)
    band = jnp.stack([jnp.eye(r, k=-(k - 1), dtype=w.dtype)
                      for k in range(3)])
    wmain = jnp.einsum("ktio,kzy->tziyo", wt, band)
    return wmain.reshape(9 * 128, r * co)


def _conv_kernel_packed_small(r, ci, co, want_stats, *refs):
    """Single-lane-block variant: the whole grid of one batch item per
    step; one (R^2, 9*128) @ (9*128, R*Co) matmul, no edge planes."""
    r2 = r * r
    rco = r * co

    xc_ref, w_ref = refs[:2]
    rest = refs[2:]
    if want_stats:
        out_ref, st_ref = rest[:2]
        p_buf, y_buf = rest[2:]
    else:
        out_ref = rest[0]
        st_ref = None
        p_buf, y_buf = rest[1:]

    bi_idx = pl.program_id(0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
    yq = rowi % r
    mask_lo = yq != 0
    mask_hi = yq != r - 1

    @pl.when(bi_idx == 0)
    def _():
        y_buf[:, :r] = jnp.zeros_like(y_buf[:, :r])
        y_buf[:, r + r2:] = jnp.zeros_like(y_buf[:, r + r2:])

    v = xc_ref[...].reshape(r2, 128)

    y_buf[0, r:r + r2] = jnp.where(
        mask_lo, jnp.concatenate([v[r2 - 1:], v[:r2 - 1]], axis=0), 0)
    y_buf[1, r:r + r2] = v
    y_buf[2, r:r + r2] = jnp.where(
        mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)
    for tap in range(9):
        t0, t1 = tap // 3 - 1, tap % 3 - 1
        p_buf[:, tap * 128:(tap + 1) * 128] = \
            y_buf[t1 + 1, r + t0 * r:r + t0 * r + r2]

    yi = jax.lax.dot_general(
        p_buf[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (r2, rco)
    yb = yi.astype(out_ref.dtype)
    out_ref[0] = yb

    if st_ref is not None:
        # stats of the rounded output (row-fold form, see _slab_stats)
        st_ref[...] = _slab_stats(r2, rco, co, yb)[None]


def pack_weights_item(w: jnp.ndarray, g: int):
    """(3,3,3,Ci,Co) -> weights for the whole-item kernel.

    g == 2: (wmain, wedge), both (9*128, 128). wmain is the banded
    in-block weight (zi -> zo iff |zi-zo| <= 1); wedge rows are
    tap*128 + [prev-plane ci | next-plane ci], matching the lane-rolled
    edge slab layout.
    g == 4 (Ci == 32): (wmain, we_pm, we_0); we_pm/we_0 are (3*128, 128)
    indexed by the s0 row-tap t0 only -- the t1 = -1/+1 taps' edge
    planes pack into ONE 128-lane group [prev(-1) | next(-1) | prev(+1)
    | next(+1)] (4*ci == 128 exactly), and t1 = 0's into [prev | next |
    zero]; 6 edge dots per output block instead of 9.
    g == 1 (Ci == 128): (wmain, wprev, wnext), each (9*128, 128) -- the
    s2 taps are whole neighbour lane-blocks, no edge slab needed.
    """
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (3, 3, 3) and g * ci == 128 and ci == co
    wt = jnp.transpose(w, (2, 0, 1, 3, 4)).reshape(3, 9, ci, co)
    band = jnp.stack([jnp.eye(g, k=-(k - 1), dtype=w.dtype)
                      for k in range(3)])
    wmain = jnp.einsum("ktio,kzy->tziyo", wt, band).reshape(9 * 128, 128)
    if g == 1:
        return wmain, wt[0].reshape(9 * 128, 128), wt[2].reshape(9 * 128, 128)
    if g == 4:
        # wt[kd, 3*(t0+1) + (t1+1)]: kd=0 feeds zo=0, kd=2 feeds zo=g-1
        wpm = jnp.zeros((3, 128, g, co), w.dtype)
        w0e = jnp.zeros((3, 128, g, co), w.dtype)
        for t0g in range(3):
            wpm = wpm.at[t0g, 0:ci, 0, :].set(wt[0, 3 * t0g + 0])
            wpm = wpm.at[t0g, ci:2 * ci, g - 1, :].set(wt[2, 3 * t0g + 0])
            wpm = wpm.at[t0g, 2 * ci:3 * ci, 0, :].set(wt[0, 3 * t0g + 2])
            wpm = wpm.at[t0g, 3 * ci:4 * ci, g - 1, :].set(
                wt[2, 3 * t0g + 2])
            w0e = w0e.at[t0g, 0:ci, 0, :].set(wt[0, 3 * t0g + 1])
            w0e = w0e.at[t0g, ci:2 * ci, g - 1, :].set(wt[2, 3 * t0g + 1])
        return (wmain, wpm.reshape(3 * 128, g * co),
                w0e.reshape(3 * 128, g * co))
    we = jnp.zeros((9, 128, g, co), w.dtype)
    we = we.at[:, :ci, 0, :].set(wt[0])
    we = we.at[:, ci:2 * ci, g - 1, :].set(wt[2])
    return wmain, we.reshape(9 * 128, 128)


def _item_vmem_bytes(r, ci, itemsize: int = 2):
    """VMEM estimate for the whole-item kernel (x, out, y_buf [, ey_buf])
    plus the in-kernel fp32 prologue temporary ((r2, rc) fp32 when
    in_scale/pre_swish is folded in) and the sc/bi input blocks. The 40MB
    dispatch gate leaves ~60MB of the 100MB kernel limit as headroom for
    the unmodelled MXU accumulators. itemsize: bytes per element of the
    activation dtype (2 bf16 / 4 fp32 — fp32 doubles the slabs; measured
    VMEM OOM at r=32 ci=64 fp32 in the pair kernel)."""
    r2, rc = r * r, r * ci
    slab = 3 * (r + r2 + r) * rc * itemsize
    nslab = 1 if ci == 128 else 2
    prologue = r2 * rc * 4 + 2 * 2 * rc * 4   # vf fp32 + sc/bi blocks (x2)
    return nslab * slab + 2 * r2 * rc * itemsize + prologue


def _fill_shifts(r, r2, rc, ci, g, v, y_buf, ey_buf):
    """Build the three s1-shifted slabs of value `v` (r2, rc) in y_buf
    (+ the lane-rolled prev/next edge slabs in ey_buf when g > 1; at
    g == 4 ey_buf is the (epm_buf, e0_buf) pair — the t1 = -1/+1 taps'
    edge planes pack into ONE lane group, see pack_weights_item).

    (Measured negative result, round 3: lane-rolling ONCE on the unshifted
    value and then row-shifting — 12 -> ~7 VPU passes on paper — made both
    the pair and block kernels ~0.1-0.3 ms/call SLOWER at r=32 C=64;
    Mosaic fuses the per-shift concat+select builds better than the
    reordered form. Keeping the per-shift builds.)"""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
    yq = rowi % r
    mask_lo = yq != 0
    mask_hi = yq != r - 1
    shifts = [
        jnp.where(mask_lo,
                  jnp.concatenate([v[r2 - 1:], v[:r2 - 1]], axis=0), 0),
        v,
        jnp.where(mask_hi,
                  jnp.concatenate([v[1:], v[:1]], axis=0), 0),
    ]
    for s in range(3):
        y_buf[s, r:r + r2] = shifts[s]
    if ey_buf is None:
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (r2, rc), 1) % 128

    def rsh(yv, s):
        return jnp.concatenate(
            [jnp.zeros((r2, s), y_buf.dtype), yv[:, :rc - s]], axis=1)

    def lsh(yv, s):
        return jnp.concatenate(
            [yv[:, s:], jnp.zeros((r2, s), y_buf.dtype)], axis=1)

    if g == 4:
        epm_buf, e0_buf = ey_buf
        vm1, v0, vp1 = shifts
        epm_buf[r:r + r2] = jnp.where(
            lane < ci, rsh(vm1, ci),
            jnp.where(lane < 2 * ci, lsh(vm1, 128 - ci),
                      jnp.where(lane < 3 * ci, rsh(vp1, 128 - ci),
                                lsh(vp1, ci))))
        e0_buf[r:r + r2] = jnp.where(
            lane < ci, rsh(v0, ci),
            jnp.where(lane < 2 * ci, lsh(v0, 128 - ci), 0))
        return
    for s in range(3):
        yv = shifts[s]
        pr = rsh(yv, ci)
        nx = lsh(yv, 128 - ci)
        if 2 * ci == 128:
            ey_buf[s, r:r + r2] = jnp.where(lane < ci, pr, nx)
        else:
            ey_buf[s, r:r + r2] = jnp.where(
                lane < ci, pr, jnp.where(lane < 2 * ci, nx, 0))


def _item_block_dots(r, r2, g, ng, y_buf, ey_buf, wm_ref, wp_ref, wn_ref,
                     we_ref, write):
    """Per-lane-block tap matmuls of the whole-item kernel; emits each
    128-lane fp32 accumulator through write(gg, lo, acc)."""
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    for gg in range(ng):
        lo = gg * 128
        acc = None
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            a = y_buf[t1 + 1, r + t0 * r:r + t0 * r + r2, lo:lo + 128]
            d = mm(a, wm_ref[tap * 128:(tap + 1) * 128, :])
            acc = d if acc is None else acc + d
        if g == 4:
            epm_buf, e0_buf = ey_buf
            wpm_ref, w0e_ref = we_ref
            for t0g in range(3):
                ro = r + (t0g - 1) * r
                acc += mm(epm_buf[ro:ro + r2, lo:lo + 128],
                          wpm_ref[t0g * 128:(t0g + 1) * 128, :])
                acc += mm(e0_buf[ro:ro + r2, lo:lo + 128],
                          w0e_ref[t0g * 128:(t0g + 1) * 128, :])
        elif g == 1:
            if gg > 0:
                for tap in range(9):
                    t0, t1 = tap // 3 - 1, tap % 3 - 1
                    acc += mm(
                        y_buf[t1 + 1, r + t0 * r:r + t0 * r + r2,
                              lo - 128:lo],
                        wp_ref[tap * 128:(tap + 1) * 128, :])
            if gg < ng - 1:
                for tap in range(9):
                    t0, t1 = tap // 3 - 1, tap % 3 - 1
                    acc += mm(
                        y_buf[t1 + 1, r + t0 * r:r + t0 * r + r2,
                              lo + 128:lo + 256],
                        wn_ref[tap * 128:(tap + 1) * 128, :])
        else:
            for tap in range(9):
                t0, t1 = tap // 3 - 1, tap % 3 - 1
                acc += mm(ey_buf[t1 + 1, r + t0 * r:r + t0 * r + r2,
                                 lo:lo + 128],
                          we_ref[tap * 128:(tap + 1) * 128, :])
        write(gg, lo, acc)


def _block_stats(yb):
    """(r2, 128) ROUNDED output block -> (2, 128) fp32 (sum, sumsq) via
    pairwise row-folds. Issued inside the per-block write callback so the
    fold VPU work overlaps the NEXT block's MXU dots instead of running
    as a serial whole-slab pass after the conv (same values as
    _slab_stats on the stored slab: s1 exact fp32 folds, s2 bf16-rounded
    squares)."""
    s1 = yb.astype(jnp.float32)
    s2 = (yb * yb).astype(jnp.float32)
    rows = yb.shape[0]
    while rows > 1:
        rows //= 2
        s1 = s1[:rows] + s1[rows:2 * rows]
        s2 = s2[:rows] + s2[rows:2 * rows]
    return jnp.concatenate([s1, s2], axis=0)


def _fold_stats_lanes(st_acc, rc, ci):
    """(2, rc) per-block stats -> (2, ci) by lane halvings."""
    s = st_acc
    w_ = rc
    while w_ > ci:
        w_ //= 2
        s = s[:, :w_] + s[:, w_:2 * w_]
    return s


def _slab_stats(r2, rc, ci, yv):
    """Per-channel (sum, sumsq) of a (r2, rc) slab via pairwise sublane
    row-folds + lane folds; returns (2, ci) fp32.

    The previous (8, r2) ones-dot underfills the MXU 16x on the M axis
    (measured 160us/call at r=32 C=64, exp_conv_variants 'foldstats' vs
    'full'); fp32 tree folds of the same rounded bf16 values are near
    free and sum MORE accurately than the dot's sequential accumulate.
    Squares still ride bf16 (yv * yv) -- bf16-level stats precision is
    the semantics (the folded GN normalizes bf16 activations).
    """
    s1 = yv.astype(jnp.float32)
    s2 = (yv * yv).astype(jnp.float32)
    rows = r2
    while rows > 1:
        rows //= 2
        s1 = s1[:rows] + s1[rows:2 * rows]
        s2 = s2[:rows] + s2[rows:2 * rows]
    w_ = rc
    while w_ > ci:
        w_ //= 2
        s1 = s1[:, :w_] + s1[:, w_:2 * w_]
        s2 = s2[:, :w_] + s2[:, w_:2 * w_]
    return jnp.concatenate([s1, s2], axis=0)


def _conv_kernel_item(r, ci, g, ng, want_stats, has_affine, pre_swish,
                      *refs):
    """Whole batch item per grid step; lane-blocks unrolled in-kernel.

    One fill_shifts pass on the full-width (R^2, R*C) slab serves every
    lane-block's nine (t0, t1) taps, so per-block work is pure MXU dots.
    The s2 edge taps read a lane-rolled copy of the slabs (prev/next
    planes moved into each block's [0:Ci | Ci:2Ci] lanes; the roll's
    zero fill provides SAME padding at the grid ends). Removing the
    (B, NG) grid kills ~2.5us/step sequencing overhead -- the dominant
    cost at 256 steps -- and the neighbour-block reads need no extra
    windowed input refs.

    The input prologue swish(x * scale + bias) runs IN-KERNEL on the one
    full-width read of x (fp32 math, as in _xla_prologue): with the
    whole-item grid it executes exactly once per item with no edge-slab
    duplication, saving the standalone XLA pass's HBM round-trip.
    """
    r2 = r * r
    rc = ng * 128

    if g == 1:
        x_ref, wm_ref, wp_ref, wn_ref = refs[:4]
        rest = refs[4:]
        we_ref = None
    elif g == 4:
        x_ref, wm_ref, wpm_ref, w0e_ref = refs[:4]
        rest = refs[4:]
        we_ref = (wpm_ref, w0e_ref)
        wp_ref = wn_ref = None
    else:
        x_ref, wm_ref, we_ref = refs[:3]
        rest = refs[3:]
        wp_ref = wn_ref = None
    if has_affine:
        sc_ref, bi_ref = rest[:2]
        rest = rest[2:]
    if want_stats:
        out_ref, st_ref = rest[:2]
        bufs = rest[2:]
    else:
        out_ref = rest[0]
        st_ref = None
        bufs = rest[1:]
    y_buf = bufs[0]
    if g == 4:
        ey_buf = (bufs[1], bufs[2])
    elif g > 1:
        ey_buf = bufs[1]
    else:
        ey_buf = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        y_buf[:, :r] = jnp.zeros_like(y_buf[:, :r])
        y_buf[:, r + r2:] = jnp.zeros_like(y_buf[:, r + r2:])
        ebufs = (() if ey_buf is None
                 else ey_buf if isinstance(ey_buf, tuple) else (ey_buf,))
        for eb in ebufs:
            if eb.ndim == 2:          # g == 4: (r + r2 + r, rc) slabs
                eb[:r] = jnp.zeros_like(eb[:r])
                eb[r + r2:] = jnp.zeros_like(eb[r + r2:])
            else:                     # g == 2: (3, r + r2 + r, rc)
                eb[:, :r] = jnp.zeros_like(eb[:, :r])
                eb[:, r + r2:] = jnp.zeros_like(eb[:, r + r2:])

    v = x_ref[0]                                     # (r2, rc)
    if has_affine or pre_swish:
        vf = v.astype(jnp.float32)
        if has_affine:
            vf = vf * sc_ref[0] + bi_ref[0]
        if pre_swish:
            vf = vf * jax.nn.sigmoid(vf)
        v = vf.astype(x_ref.dtype)
    _fill_shifts(r, r2, rc, ci, g, v, y_buf, ey_buf)

    st_parts = []

    def write(gg, lo, acc):
        yb = acc.astype(out_ref.dtype)
        out_ref[0, :, lo:lo + 128] = yb
        if st_ref is not None:
            # per-block stats of the ROUNDED output inside the write
            # callback: the fold VPU work issues right after each block's
            # dots and overlaps the next block's MXU (the whole-slab pass
            # this replaces ran serially after the conv)
            st_parts.append(_block_stats(yb))

    _item_block_dots(r, r2, g, ng, y_buf, ey_buf, wm_ref, wp_ref, wn_ref,
                     we_ref, write)

    if st_ref is not None:
        st_acc = jnp.concatenate(st_parts, axis=1)       # (2, rc)
        st_ref[...] = _fold_stats_lanes(st_acc, rc, ci)[None]


def _conv_kernel_pair(r, ci, g, ng, *refs):
    """conv0 -> GN/AdaGN fold -> swish -> conv1 for one whole batch item,
    never leaving VMEM (nn/pvconv.py fused flow with the intermediate y0
    HBM round-trip and the XLA fold pass eliminated).

    The fold replicates gn_affine_from_stats (nn/common.py:236-265) with
    pre_bias=b0 on conv0's ROUNDED bf16 output (same semantics as the
    two-kernel flow: stats of what conv1 would have read from HBM), then
    composes the post-GN channel affine (ca, cb): sc = rs_c * ca,
    bi = (b0 - mu_c) * rs_c * ca + cb.
    """
    r2 = r * r
    rc = ng * 128
    nw = 3 if g == 1 else 2
    x_ref = refs[0]
    w0 = refs[1:1 + nw]
    w1 = refs[1 + nw:1 + 2 * nw]
    b0_ref, ca_ref, cb_ref = refs[1 + 2 * nw:4 + 2 * nw]
    out_ref, st_ref = refs[4 + 2 * nw:6 + 2 * nw]
    bufs = refs[6 + 2 * nw:]
    # phase-alternating slabs: conv0 fills/reads (y_a, ey_a), conv1
    # (y_b, ey_b). Besides splitting the two in-item fills, this removes
    # the cross-grid-step WAR hazard (item i+1's conv0 fill would
    # otherwise stall on item i's conv1 dots still reading the shared
    # slab), so the VPU fill pipelines under the previous item's MXU.
    if g > 1:
        y_a, y_b, ey_a, ey_b, y0_buf = bufs
    else:
        y_a, y_b, y0_buf = bufs
        ey_a = ey_b = None
    wm0, wp0, wn0 = (w0 if g == 1 else (w0[0], None, None))
    we0 = None if g == 1 else w0[1]
    wm1, wp1, wn1 = (w1 if g == 1 else (w1[0], None, None))
    we1 = None if g == 1 else w1[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for buf in (y_a, y_b, ey_a, ey_b):
            if buf is not None:
                buf[:, :r] = jnp.zeros_like(buf[:, :r])
                buf[:, r + r2:] = jnp.zeros_like(buf[:, r + r2:])

    # ---- conv0: x -> y0 (VMEM only) ----
    _fill_shifts(r, r2, rc, ci, g, x_ref[0], y_a, ey_a)

    st0_parts = []

    def write0(gg, lo, acc):
        yb = acc.astype(y0_buf.dtype)
        y0_buf[:, lo:lo + 128] = yb
        st0_parts.append(_block_stats(yb))

    _item_block_dots(r, r2, g, ng, y_a, ey_a, wm0, wp0, wn0, we0,
                     write0)

    # ---- in-kernel GN fold (fp32 over (1, ci) rows) ----
    st0 = _fold_stats_lanes(jnp.concatenate(st0_parts, axis=1), rc, ci)
    count = float(r) ** 3
    b0 = b0_ref[0, 0]                                    # (1, ci) fp32
    s1 = st0[0:1]
    s2 = st0[1:2]
    mean_c = s1 / count + b0
    ex2_c = s2 / count + 2.0 * b0 * (s1 / count) + b0 * b0
    cg = ci // 8
    gi = jax.lax.broadcasted_iota(jnp.int32, (ci, ci), 0) // cg
    gj = jax.lax.broadcasted_iota(jnp.int32, (ci, ci), 1) // cg
    gmap = jnp.where(gi == gj, 1.0 / cg, 0.0).astype(jnp.float32)
    mmf = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mu_c = mmf(mean_c, gmap)                             # (1, ci)
    gex2 = mmf(ex2_c, gmap)
    gvar = jnp.maximum(gex2 - mu_c * mu_c, 0.0)
    rs_c = jax.lax.rsqrt(gvar + 1e-5)
    ca = ca_ref[0, 0]
    cb = cb_ref[0, 0]
    sc = rs_c * ca                                       # (1, ci)
    bi = (b0 - mu_c) * rs_c * ca + cb
    while sc.shape[1] < rc:                              # tile to (1, rc)
        sc = jnp.concatenate([sc, sc], axis=1)
        bi = jnp.concatenate([bi, bi], axis=1)

    # ---- conv1: swish(y0 * sc + bi) -> out (+ stats) ----
    vf = y0_buf[...].astype(jnp.float32) * sc + bi
    vf = vf * jax.nn.sigmoid(vf)
    _fill_shifts(r, r2, rc, ci, g, vf.astype(y_a.dtype), y_b, ey_b)

    st1_parts = []

    def write1(gg, lo, acc):
        yb = acc.astype(out_ref.dtype)
        out_ref[0, :, lo:lo + 128] = yb
        st1_parts.append(_block_stats(yb))

    _item_block_dots(r, r2, g, ng, y_b, ey_b, wm1, wp1, wn1, we1,
                     write1)
    st_ref[...] = _fold_stats_lanes(jnp.concatenate(st1_parts, axis=1),
                                    rc, ci)[None]


def _pair_vmem_bytes(r, ci, itemsize: int = 2, dual_slabs: bool = True):
    """Item-kernel estimate plus the second (phase-alternating) slab set
    (the standalone pair kernel; pvblock keeps one set and passes
    dual_slabs=False), the resident y0 slab and the fp32 fold
    temporary."""
    r2, rc = r * r, r * ci
    nslab = 1 if ci == 128 else 2
    extra_slabs = (nslab * 3 * (r + r2 + r) * rc * itemsize
                   if dual_slabs else 0)
    return (_item_vmem_bytes(r, ci, itemsize) + extra_slabs
            + r2 * rc * (itemsize + 4))


def supports_packed_pair(r: int, ci: int, co: int,
                         itemsize: int = 2) -> bool:
    """Measured on v5e (profile_conv_pair / profile_local_step): the pair
    wins ~220us/call at r=32 C=64 (the FP3 hot shape) but LOSES at C=32
    (g=4 ey_buf pressure) and at r=16 C=128 — restrict dispatch to the
    shapes where fusing beats the two-call chain. fp32 activations double
    the slabs past the VMEM limit (measured OOM), so callers must pass
    their dtype's itemsize."""
    return (supports_packed(r, ci, co) and r == 32 and ci == 64
            and _pair_vmem_bytes(r, ci, itemsize) <= 96 * 2 ** 20)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def conv3d_packed_pair(xp: jnp.ndarray, w0: jnp.ndarray, b0: jnp.ndarray,
                       ca0: jnp.ndarray, cb0: jnp.ndarray,
                       w1: jnp.ndarray, r: int, interpret: bool = False):
    """Fused PVConv conv pair: y1 = conv1(swish(AdaGN(conv0(x) + b0))),
    with AdaGN folded from in-kernel stats via the post-GN channel affine
    (ca0, cb0) (B, C) (Normalizer channel-affine mode). Returns
    (y1_raw, st1) exactly like chaining conv3d_packed_fused twice with
    the XLA fold between (reference semantics: models/pvcnn2_ada.py
    PVConv conv->norm->swish->conv). NOT differentiable; sampling only.
    """
    b, r2, rc = xp.shape
    ci = rc // r
    # interpret mode (CPU parity tests) has no VMEM constraint
    itemsize = 2 if interpret else jnp.dtype(xp.dtype).itemsize
    assert supports_packed_pair(r, ci, ci, itemsize), (r, ci, xp.dtype)
    g = 128 // ci
    ng = (r * ci) // 128
    ws0 = tuple(x.astype(xp.dtype)
                for x in pack_weights_item(w0.astype(jnp.float32), g))
    ws1 = tuple(x.astype(xp.dtype)
                for x in pack_weights_item(w1.astype(jnp.float32), g))

    in_specs = ([pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0))]
                + [pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0))]
                * (len(ws0) + len(ws1))
                + [pl.BlockSpec((1, 1, ci), lambda bi: (0, 0, 0)),
                   pl.BlockSpec((1, 1, ci), lambda bi: (bi, 0, 0)),
                   pl.BlockSpec((1, 1, ci), lambda bi: (bi, 0, 0))])
    args = [xp, *ws0, *ws1,
            b0.astype(jnp.float32).reshape(1, 1, ci),
            ca0.astype(jnp.float32)[:, None, :],
            cb0.astype(jnp.float32)[:, None, :]]
    out_specs = [pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0)),
                 pl.BlockSpec((1, 2, ci), lambda bi: (bi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, r2, rc), xp.dtype),
                  jax.ShapeDtypeStruct((b, 2, ci), jnp.float32)]
    scratch = [pltpu.VMEM((3, r + r2 + r, rc), xp.dtype),   # y_a
               pltpu.VMEM((3, r + r2 + r, rc), xp.dtype)]   # y_b
    if g > 1:
        scratch += [pltpu.VMEM((3, r + r2 + r, rc), xp.dtype),  # ey_a
                    pltpu.VMEM((3, r + r2 + r, rc), xp.dtype)]  # ey_b
    scratch.append(pltpu.VMEM((r2, rc), xp.dtype))       # y0

    kern = functools.partial(_conv_kernel_pair, r, ci, g, ng)
    y1, st1 = pl.pallas_call(
        kern, grid=(b,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*args)
    return y1, st1


def _packed_item_call(xp, w, r, ci, in_scale, in_bias, pre_swish,
                      want_stats, interpret):
    b, r2, rc = xp.shape
    g = 128 // ci
    ng = (r * ci) // 128
    ws = pack_weights_item(w.astype(jnp.float32), g)
    ws = tuple(x.astype(xp.dtype) for x in ws)
    has_affine = in_scale is not None

    in_specs = ([pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0))]
                + [pl.BlockSpec(w_.shape, lambda bi: (0, 0)) for w_ in ws])
    args = [xp, *ws]
    if has_affine:
        reps = rc // ci
        sc = jnp.tile(in_scale.astype(jnp.float32), (1, reps))[:, None, :]
        bi = jnp.tile(in_bias.astype(jnp.float32), (1, reps))[:, None, :]
        in_specs += [pl.BlockSpec((1, 1, rc), lambda bi: (bi, 0, 0))] * 2
        args += [sc, bi]
    out_specs = [pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, r2, rc), xp.dtype)]
    scratch = [pltpu.VMEM((3, r + r2 + r, rc), xp.dtype)]
    if g == 4:
        scratch += [pltpu.VMEM((r + r2 + r, rc), xp.dtype),   # epm
                    pltpu.VMEM((r + r2 + r, rc), xp.dtype)]   # e0
    elif g > 1:
        scratch.append(pltpu.VMEM((3, r + r2 + r, rc), xp.dtype))
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, ci), lambda bi: (bi, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b, 2, ci), jnp.float32))

    kern = functools.partial(_conv_kernel_item, r, ci, g, ng, want_stats,
                             has_affine, pre_swish)
    out = pl.pallas_call(
        kern, grid=(b,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*args)
    return out if want_stats else out[0]


def _conv_kernel_packed(r, ci, want_stats, *refs):
    """One output lane-block (128//ci s2-planes, one batch item) per step.

    No halo rows: SAME-padding along the row dims (s0, s1) is enforced by
    masking -- the s1 taps are three shifted copies with the wrapped rows
    zeroed (y_buf, with R zero guard rows on both ends), and the s0 taps
    become R-row-aligned slices of y_buf (zero relayout; the guard rows
    supply the s0 borders).
    """
    r2 = r * r
    kmain = 9 * 128
    ce = 2 * ci
    kedge = _ceil(18 * ci, 128)

    xp_ref, xc_ref, xn_ref, w_ref = refs[:4]
    rest = refs[4:]
    if want_stats:
        out_ref, st_ref = rest[:2]
        p_buf, y_buf, ey_buf, edge_buf, st_buf = rest[2:]
    else:
        out_ref = rest[0]
        st_ref = None
        p_buf, y_buf, ey_buf, edge_buf = rest[1:]
        st_buf = None

    bi_idx = pl.program_id(0)
    gi = pl.program_id(1)
    ng = pl.num_programs(1)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
    yq = rowi % r
    mask_lo = yq != 0        # rows valid for the s1-1 tap
    mask_hi = yq != r - 1    # rows valid for the s1+1 tap

    @pl.when(jnp.logical_and(bi_idx == 0, gi == 0))
    def _():
        y_buf[:, :r] = jnp.zeros_like(y_buf[:, :r])
        y_buf[:, r + r2:] = jnp.zeros_like(y_buf[:, r + r2:])
        ey_buf[:, :r] = jnp.zeros_like(ey_buf[:, :r])
        ey_buf[:, r + r2:] = jnp.zeros_like(ey_buf[:, r + r2:])
        if kedge != 18 * ci:
            p_buf[:, kmain + 18 * ci:] = jnp.zeros(
                (r2, kedge - 18 * ci), p_buf.dtype)

    def fill_shifts(buf, v):
        # buf (3, r + r2 + r, L): guard rows zero; slot j+1 holds the
        # s1-shift by j with wrapped rows masked out
        buf[0, r:r + r2] = jnp.where(
            mask_lo, jnp.concatenate([v[r2 - 1:], v[:r2 - 1]], axis=0), 0)
        buf[1, r:r + r2] = v
        buf[2, r:r + r2] = jnp.where(
            mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)

    # --- main block (input already prologued by the wrapper's XLA pass)
    v = xc_ref[...].reshape(r2, 128)
    fill_shifts(y_buf, v)

    # --- combined edge planes: [last plane of block g-1 | first plane of
    #     block g+1], one full-width pipeline for both s2 edge taps
    edge_buf[0, :, :ci] = xp_ref[0, :, 128 - ci:]
    edge_buf[0, :, ci:] = xn_ref[0, :, :ci]
    # zero the halves that fall off the grid ends (SAME padding)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r2, ce), 1)
    is_prev = (lane < ci).astype(p_buf.dtype)
    mf = (is_prev * (gi > 0).astype(p_buf.dtype)
          + (1 - is_prev) * (gi < ng - 1).astype(p_buf.dtype))
    ev = edge_buf[...].reshape(r2, ce) * mf
    fill_shifts(ey_buf, ev)
    for tap in range(9):
        t0, t1 = tap // 3 - 1, tap % 3 - 1
        p_buf[:, kmain + tap * ce:kmain + (tap + 1) * ce] = \
            ey_buf[t1 + 1, r + t0 * r:r + t0 * r + r2]

    # --- matmuls, fp32 accumulation: the nine main taps read aligned
    # row-slices of y_buf directly (no patch materialization; same total
    # MXU cycles as one K=9*128 dot), the edge taps one p_buf dot
    yi = jax.lax.dot_general(
        p_buf[:, kmain:], w_ref[kmain:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # (r2, 128)
    for tap in range(9):
        t0, t1 = tap // 3 - 1, tap % 3 - 1
        yi += jax.lax.dot_general(
            y_buf[t1 + 1, r + t0 * r:r + t0 * r + r2],
            w_ref[tap * 128:(tap + 1) * 128, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    yb = yi.astype(out_ref.dtype)
    out_ref[0] = yb

    if st_ref is not None:
        # stats on the MXU: sum = ones @ y; sumsq = diag(y^T y). The fp32
        # y rides the bf16 MXU exactly via a hi/lo split (fp32 dots would
        # lower to the 6-pass emulation): y = hi + lo with |lo| <= ulp(hi)
        y_hi = yi.astype(jnp.bfloat16)
        y_lo = (yi - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ones = jnp.ones((8, r2), jnp.bfloat16)
        dot = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s1 = (jax.lax.dot_general(
                  ones, y_hi, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  ones, y_lo, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32))[0:1]   # (1, 128)
        # only the diagonal is consumed and diag(hi^T lo) == diag(lo^T hi)
        yty = (dot(y_hi, y_hi) + 2.0 * dot(y_hi, y_lo)
               + dot(y_lo, y_lo))                         # (128, 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        s2 = jnp.sum(jnp.where(ii == jj, yty, 0.0), axis=0,
                     keepdims=True)                       # (1, 128)
        w_ = 128
        while w_ > ci:
            w_ //= 2
            s1 = s1[:, :w_] + s1[:, w_:2 * w_]
            s2 = s2[:, :w_] + s2[:, w_:2 * w_]
        st = jnp.concatenate([s1, s2], axis=0)[None]      # (1, 2, ci)

        @pl.when(gi == 0)
        def _():
            st_buf[...] = st

        @pl.when(gi > 0)
        def _():
            st_buf[...] += st

        @pl.when(gi == ng - 1)
        def _():
            st_ref[...] = st_buf[...]


def _xla_prologue(xp, ci, in_scale, in_bias, pre_swish):
    """swish(x * scale + bias) as ONE XLA elementwise fusion on the packed
    (dense-lane) layout. Hoisting this out of the Pallas kernels removes
    the serialized fp32 VPU prologue from every grid step (and its
    duplicate on the edge planes); the XLA pass is HBM-bound on a layout
    with no tile inflation. fp32 math, matching the 5D kernels."""
    if in_scale is None and not pre_swish:
        return xp
    b, r2, rc = xp.shape
    xf = xp.astype(jnp.float32)
    if in_scale is not None:
        reps = rc // ci
        sc = jnp.tile(in_scale.astype(jnp.float32), (1, reps))[:, None, :]
        bi = jnp.tile(in_bias.astype(jnp.float32), (1, reps))[:, None, :]
        xf = xf * sc + bi
    if pre_swish:
        xf = xf * jax.nn.sigmoid(xf)
    return xf.astype(xp.dtype)


@functools.partial(jax.jit,
                   static_argnames=("r", "pre_swish", "want_stats",
                                    "interpret"))
def conv3d_packed_fused(xp: jnp.ndarray, w: jnp.ndarray, r: int,
                        in_scale=None, in_bias=None,
                        pre_swish: bool = False, want_stats: bool = False,
                        interpret: bool = False):
    """xp (B, R^2, R*C) packed voxel grid -> same layout, C_out == C_in.

    w (3,3,3,C,C); in_scale/in_bias (B, C) per-channel input affine
    (folded previous norm + conv bias), applied with optional swish
    BEFORE the conv (inside the kernel). Returns yp [, stats (B,2,C)
    fp32 = per-channel (sum, sumsq) of the conv output over the R^3
    voxels]. NOT differentiable -- sampling path only.
    """
    b, r2, rc = xp.shape
    ci = rc // r
    co = w.shape[-1]
    if r * ci == 128:
        return _packed_small_call(xp, w, r, ci, co, in_scale, in_bias,
                                  pre_swish, want_stats, interpret)
    assert r2 == r * r and supports_packed(r, ci, ci), (r, ci)
    # gate raised 40->56MB when the estimate learned about the fp32
    # prologue temporary: same dispatch decisions as before at every
    # known shape (r=32/ci=64 estimates 43.5M and fits the 100MB limit);
    # dtype-aware since fp32 activations double the slabs
    if _item_vmem_bytes(r, ci, jnp.dtype(xp.dtype).itemsize) <= 56 * 2 ** 20:
        return _packed_item_call(xp, w, r, ci, in_scale, in_bias,
                                 pre_swish, want_stats, interpret)
    g = 128 // ci
    ng = (r * ci) // 128
    kmain = 9 * 128
    kedge = _ceil(18 * ci, 128)
    kext = kmain + kedge
    le = max(128, 2 * ci)

    wext = pack_weights_ext(w.astype(jnp.float32), g).astype(xp.dtype)
    xp = _xla_prologue(xp, ci, in_scale, in_bias, pre_swish)

    in_specs = [
        pl.BlockSpec((1, r2, 128),
                     lambda bi, gg: (bi, 0, jnp.maximum(gg - 1, 0))),
        pl.BlockSpec((1, r2, 128), lambda bi, gg: (bi, 0, gg)),
        pl.BlockSpec((1, r2, 128),
                     lambda bi, gg: (bi, 0, jnp.minimum(gg + 1, ng - 1))),
        pl.BlockSpec((kext, 128), lambda bi, gg: (0, 0)),
    ]
    args = [xp, xp, xp, wext]

    out_specs = [pl.BlockSpec((1, r2, 128), lambda bi, gg: (bi, 0, gg))]
    out_shapes = [jax.ShapeDtypeStruct((b, r2, rc), xp.dtype)]
    scratch = [pltpu.VMEM((r2, kext), xp.dtype),
               pltpu.VMEM((3, r + r2 + r, 128), xp.dtype),
               pltpu.VMEM((3, r + r2 + r, 2 * ci), xp.dtype),
               pltpu.VMEM((1, r2, 2 * ci), xp.dtype)]
    # NOTE p_buf main region is unused now; kept sized for the edge
    # columns at the same offsets (kmain..kext)
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, ci),
                                      lambda bi, gg: (bi, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b, 2, ci), jnp.float32))
        scratch.append(pltpu.VMEM((1, 2, ci), jnp.float32))

    kern = functools.partial(_conv_kernel_packed, r, ci, want_stats)
    out = pl.pallas_call(
        kern, grid=(b, ng), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*args)
    return out if want_stats else out[0]


def _packed_small_call(xp, w, r, ci, co, in_scale, in_bias, pre_swish,
                       want_stats, interpret):
    b, r2, _ = xp.shape
    assert supports_packed_small(r, ci, co), (r, ci, co)
    rco = r * co
    wsm = pack_weights_small(w.astype(jnp.float32)).astype(xp.dtype)
    xp = _xla_prologue(xp, ci, in_scale, in_bias, pre_swish)

    in_specs = [
        pl.BlockSpec((1, r2, 128), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((9 * 128, rco), lambda bi: (0, 0)),
    ]
    args = [xp, wsm]

    out_specs = [pl.BlockSpec((1, r2, rco), lambda bi: (bi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, r2, rco), xp.dtype)]
    scratch = [pltpu.VMEM((r2, 9 * 128), xp.dtype),
               pltpu.VMEM((3, r + r2 + r, 128), xp.dtype)]
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, co), lambda bi: (bi, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b, 2, co), jnp.float32))

    kern = functools.partial(_conv_kernel_packed_small, r, ci, co,
                             want_stats)
    out = pl.pallas_call(
        kern, grid=(b,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=interpret,
        # the default 16M scoped limit rejects the (r2, 9*128) p_buf +
        # double-buffered blocks at batch>=16 (observed 16.57M request)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*args)
    return out if want_stats else out[0]
