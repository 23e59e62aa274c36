"""Fully fused PointNet++ set-abstraction block (eval/sampling path).

One Pallas kernel per batch item computes:

    ball query -> neighbor gather -> [Dense -> GroupNorm8 -> affine ->
    swish] x L -> max over the K neighbor slots

without ever materializing the (B, M, K, 3+C) grouped tensor (or any of
the (B, M, K, C_l) MLP activations) in HBM. Reference semantics:
ball_query.cu:19-50 + grouping.cu:18-36 + models/pvcnn2.py:288-353
(PointNetSAModule) / models/pvcnn2_ada.py:323-411.

GroupNorm statistics are GLOBAL per (item, channel group) -- over the
group's channels AND all M*K slots, exactly like torch GroupNorm on the
(B, C, M, K) grouped tensor -- which is why the whole item runs as ONE
grid step: center tiles are an in-kernel loop writing layer activations
to VMEM scratch, and each layer's stats reduce over the full scratch
before its normalize+affine+swish pass. Neighbor-miss slots replicate
slot 0 BEFORE statistics (the reference pads the grouped tensor the same
way, so pad slots participate in GN stats).

Key facts making this fast on TPU:
  * The first Dense commutes with the gather: z1[m,j] = A[p(m,j)] + B[m]
    where A = [xyz ++ feats] @ W1 + b1 (per point, computed ONCE in XLA)
    and B = -(centers @ W1[:3]) (per center). The kernel gathers C1-dim
    A-rows via the selection matmul -- fewer table rows than gathering
    [xyz_hi, xyz_lo, feats], and layer 1 costs no in-kernel matmul.
  * The selection gather runs TRANSPOSED -- dot(A_t (2*C1, N), sel
    (Mt*K, N)) with stacked hi/lo rows -- so MXU cost scales with C1,
    not 128 table lanes, and the fp32 A reconstructs exactly (sel is
    one-hot).
  * Group statistics ride the MXU: per-channel sums are ones-matmuls;
    the (C, 1) -> group -> (C, 1) foldings are tiny constant-matrix dots.
  * Variance is computed on CENTERED values, E[(z - mu)^2]: the
    E[z^2] - mu^2 form lets bf16 rounding blow up rsqrt when a group's
    variance is small relative to its mean.

Per-channel affine (ca, cb) folds the GroupNorm affine params and the
AdaGN style factor/bias: out = GN0(z) * ca + cb where GN0 is the
parameter-free normalizer. Not differentiable -- sampling/eval only;
training uses the modular ball_query_group + SharedMLP path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ball_query_group import _lane_exclusive_cumsum


def _tile_lanes(x, reps):
    """(rows, L) -> (rows, L*reps) by log-doubling (reps power of two)."""
    while reps > 1:
        x = jnp.concatenate([x, x], axis=1)
        reps //= 2
    return x


def _split(v):
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _group_fold(s_c, groups, scale):
    """(C, 8) per-channel values (identical columns) -> per-group mean
    (times scale) expanded back to (C, 8). Tiny constant-matrix dots,
    exact through the bf16 MXU via hi/lo (gq entries are powers of two
    for the power-of-two M*K/q this kernel serves)."""
    c = s_c.shape[0]
    q = c // groups
    rowg = lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    colg = lax.broadcasted_iota(jnp.int32, (groups, c), 1) // q
    gq = jnp.where(rowg == colg, scale / q, 0.0).astype(jnp.bfloat16)
    rowq = lax.broadcasted_iota(jnp.int32, (c, groups), 0) // q
    cole = lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    e = (rowq == cole).astype(jnp.bfloat16)
    mm = functools.partial(lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    s_hi, s_lo = _split(s_c)
    f8 = mm(gq, s_hi) + mm(gq, s_lo)                   # (8, 8)
    f_hi, f_lo = _split(f8)
    return mm(e, f_hi) + mm(e, f_lo)                   # (C, 8)


def _col_sums(x):
    """(C, L) -> (C, 8) fp32 row sums (identical columns) via a
    ones-matmul (hi/lo exact for fp32 inputs; bf16 inputs are already
    rounded and sum in one dot)."""
    l = x.shape[1]
    ones = jnp.ones((8, l), jnp.bfloat16)
    dott = functools.partial(lax.dot_general,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if x.dtype == jnp.bfloat16:
        return dott(x, ones)
    hi, lo = _split(x)
    return dott(hi, ones) + dott(lo, ones)


def _sa_kernel(k, n_layers, mt, eps, r2_ref, ctr_ref, pts_ref, a_ref,
               bc_ref, *rest):
    """rest = [wT_l (C_l, C_{l-1}), b_l (C_l, 1)] for l = 2..L,
              [ca_l (1, C_l, 1), cb_l (1, C_l, 1)] for l = 1..L,
       out_ref (1, C_L, M),
       scratch: sel_buf (mt*k, n), z_bufs[l] (C_l, M*K) bf16 l = 1..L,
                h_buf (max C_l, M*K) bf16, g_buf (2*C1, mt*k) f32."""
    m = ctr_ref.shape[1]
    n = pts_ref.shape[2]
    ntile = m // mt
    lt = mt * k
    ws = rest[:2 * (n_layers - 1)]
    affs = rest[2 * (n_layers - 1):2 * (n_layers - 1) + 2 * n_layers]
    out_ref = rest[2 * (n_layers - 1) + 2 * n_layers]
    sel_buf = rest[-3 - n_layers]
    z_bufs = rest[-2 - n_layers:-2]
    h_buf = rest[-2]
    g_buf = rest[-1]
    r2 = r2_ref[0]

    pts = pts_ref[0]                                  # (3, N) fp32
    a = a_ref[0]                                      # (C1, N) fp32
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    a_hl = jnp.concatenate([a_hi, a_lo], axis=0)
    c1 = a.shape[0]

    dott = functools.partial(lax.dot_general,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    # ---- phase 1: ball query + exact gather, one center tile at a time
    for t in range(ntile):
        ctr = ctr_ref[0, t * mt:(t + 1) * mt, :]      # (mt, 3)
        d2 = jnp.zeros((mt, n), jnp.float32)
        for d in range(3):
            diff = ctr[:, d:d + 1] - pts[d:d + 1, :]
            d2 = d2 + diff * diff
        inball = d2 < r2
        rank = _lane_exclusive_cumsum(inball.astype(jnp.int32))
        count = rank[:, n - 1:n] + inball[:, n - 1:n]
        key = jnp.where(jnp.logical_and(inball, rank < k), rank, k)
        lane0 = lax.broadcasted_iota(jnp.int32, (mt, n), 1) == 0
        key = jnp.where(jnp.logical_and(count == 0, lane0), 0, key)
        # lane-major counts via a K=1 outer product: the old
        # dott(ones(8, n), inball) form paid a K=N-deep MXU pass per
        # tile (~2.2us at N=2048 — as much as the gather dot itself,
        # exp_sa_anatomy round 5). Only min(count, k) is ever consumed
        # (miss compares against jlane < k), and k <= 256 keeps the
        # bf16 mantissa exact.
        cmin = jnp.minimum(count, k).astype(jnp.bfloat16)  # (mt, 1)
        cnt8 = dott(jnp.ones((8, 1), jnp.bfloat16), cmin)  # (8, mt)

        # int32 compares (Mosaic on v5e rejects vector bf16 cmpf); the
        # bool result casts straight to the bf16 selection one-hot.
        # Build and gather in slot chunks: chunk c+1's VPU one-hot
        # build touches disjoint sel_buf rows from chunk c's MXU gather
        # dot (and from the previous TILE's last chunks), so the builds
        # pipeline under the dots instead of serializing per tile.
        #
        # COUNT GATING: a chunk covering slots [s0, s1) is all-miss for
        # every center in the tile when max(count) <= s0 — its gather
        # result is discarded by the miss-replication select below — so
        # both its one-hot build (the kernel's dominant VPU cost,
        # k*mt*n stores/tile) and its gather dot are skipped. Through
        # most of the 1000-step DDPM chain the latent points are
        # noise-spread and ball-query counts are tiny, so typically only
        # the slot-0 chunk runs. Skipped chunks leave stale/uninit
        # g_buf lanes; those feed only the discarded side of the
        # jnp.where(miss, ...) select, which is NaN-safe.
        cnt_max = jnp.max(count)
        bounds = sorted(set(
            [0] + [bb for bb in (1, 2, 4) if bb < k]
            + list(range(8, k, 8)) + [k]))
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            def _chunk(s0=s0, s1=s1):
                for j in range(s0, s1):
                    sel_buf[j * mt:(j + 1) * mt, :] = \
                        (key == j).astype(jnp.bfloat16)
                g_buf[:, s0 * mt:s1 * mt] = \
                    dott(a_hl, sel_buf[s0 * mt:s1 * mt, :])
            if s0 == 0:
                _chunk()
            else:
                pl.when(cnt_max > s0)(_chunk)
        ghl = g_buf[...]                              # (2*C1, lt)
        g = ghl[:c1] + ghl[c1:]
        z = g + _tile_lanes(bc_ref[0, :, t * mt:(t + 1) * mt]
                            .astype(jnp.float32), k)
        # replicate slot 0 into miss slots BEFORE stats (reference pad
        # semantics: pad slots participate in GroupNorm statistics)
        cnt_t = _tile_lanes(cnt8[0:1], k)             # (1, lt)
        jlane = lax.broadcasted_iota(jnp.int32, (1, lt), 1) // mt
        miss = jlane >= jnp.maximum(cnt_t, 1.0).astype(jnp.int32)
        z = jnp.where(miss, _tile_lanes(z[:, :mt], k), z)
        z_bufs[0][:, t * lt:(t + 1) * lt] = z.astype(z_bufs[0].dtype)

    # ---- phases 2..: per layer, global GN stats -> normalize+affine+
    #      swish -> next layer's matmul, tile by tile
    for li in range(n_layers):
        zb = z_bufs[li]
        c = zb.shape[0]
        s_c = jnp.zeros((c, 8), jnp.float32)
        for t in range(ntile):
            s_c = s_c + _col_sums(zb[:, t * lt:(t + 1) * lt])
        mu_c = _group_fold(s_c, 8, 1.0 / (m * k))[:, 0:1]   # (C, 1)
        v_c = jnp.zeros((c, 8), jnp.float32)
        for t in range(ntile):
            zc = zb[:, t * lt:(t + 1) * lt] - mu_c
            zcb = zc.astype(jnp.bfloat16)
            v_c = v_c + _col_sums(zcb * zcb)
        rs_c = lax.rsqrt(_group_fold(v_c, 8, 1.0 / (m * k))[:, 0:1]
                         + eps)
        ca = affs[2 * li][0].astype(jnp.float32)
        cb = affs[2 * li + 1][0].astype(jnp.float32)
        sc = rs_c * ca                                # (C, 1)
        sh = cb - mu_c * sc
        for t in range(ntile):
            h = zb[:, t * lt:(t + 1) * lt] * sc + sh
            h = h * jax.nn.sigmoid(h)
            h_buf[0:c, t * lt:(t + 1) * lt] = h.astype(jnp.bfloat16)
            if li + 1 < n_layers:
                wt = ws[2 * li][...]
                bl = ws[2 * li + 1][...]
                z2 = lax.dot_general(
                    wt, h_buf[0:c, t * lt:(t + 1) * lt],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                z_bufs[li + 1][:, t * lt:(t + 1) * lt] = \
                    (z2 + bl.astype(jnp.float32)).astype(z_bufs[0].dtype)

    # ---- final: max over the K slots per tile
    c_last = z_bufs[-1].shape[0]
    for t in range(ntile):
        h = h_buf[0:c_last, t * lt:(t + 1) * lt].astype(jnp.float32)
        w = lt
        while w > mt:
            w //= 2
            h = jnp.maximum(h[:, :w], h[:, w:2 * w])
        out_ref[0, :, t * mt:(t + 1) * mt] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(8, 9, 10))
def pointnet_sa_fused_pallas(points, centers, a_t, bc, ws, bs, cas, cbs,
                             radius: float, num_neighbors: int,
                             interpret: bool = False):
    """Fused SA block. Returns (B, C_L, M) (channel-first; transpose is
    the caller's one cheap XLA op).

    points (B, N, 3) fp32; centers (B, M, 3) fp32;
    a_t (B, C1, N) fp32 (gathered exactly via an in-kernel hi/lo split):
        transposed per-point layer-1 activations [xyz ++ feats] @ W1 + b1;
    bc (B, C1, M): transposed per-center offsets -(centers @ W1[:3]);
    ws: tuple of (C_l, C_{l-1}) layer weights (transposed), l = 2..L;
    bs: tuple of (C_l, 1) biases, l = 2..L;
    cas/cbs: tuples of (B, C_l) per-channel post-GN affines, l = 1..L.
    """
    b, n, _ = points.shape
    m = centers.shape[1]
    k = num_neighbors
    c1 = a_t.shape[1]
    n_layers = len(cas)
    c_last = cas[-1].shape[-1]
    c_max = max(ca.shape[-1] for ca in cas)
    assert k & (k - 1) == 0, f"K must be a power of two, got {k}"
    # the unrolled per-slot selection build and the (mt*k, n) sel scratch
    # are linear in K: keep a generous sanity bound
    assert k <= 512, f"K={k}: unrolled selection build would explode"
    assert len(ws) == len(bs) == n_layers - 1

    mt = min(m, 128)
    while m % mt:
        mt //= 2
    while mt * k * n * 2 > 24 * 2 ** 20 and mt > 8:
        mt //= 2

    points_t = jnp.transpose(points, (0, 2, 1)).astype(jnp.float32)
    r2 = jnp.full((1,), jnp.float32(radius) ** 2)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c1, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c1, m), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [r2, centers.astype(jnp.float32), points_t,
            a_t.astype(jnp.float32), bc]
    for wt, bl in zip(ws, bs):
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wt.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec(bl.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bl.astype(jnp.float32))
    for ca, cb in zip(cas, cbs):
        cl = ca.shape[-1]
        for x in (ca, cb):
            in_specs.append(pl.BlockSpec((1, cl, 1), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(x.reshape(b, cl, 1).astype(jnp.float32))

    scratch = [pltpu.VMEM((mt * k, n), jnp.bfloat16)]
    # z activations ride bf16: GroupNorm stats are taken on the ROUNDED
    # values (the packed conv kernels' discipline — stats of what the
    # next stage reads) and the phase traffic over (C, M*K) was the
    # kernel's bandwidth hog at fp32 (measured r4: ~1GB/call at SA0)
    for ca in cas:
        scratch.append(pltpu.VMEM((ca.shape[-1], m * k), jnp.bfloat16))
    scratch.append(pltpu.VMEM((c_max, m * k), jnp.bfloat16))
    scratch.append(pltpu.VMEM((2 * c1, mt * k), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_sa_kernel, k, n_layers, mt, 1e-5),
        out_shape=jax.ShapeDtypeStruct((b, c_last, m), jnp.bfloat16),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_last, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
    )(*args)
    return out
