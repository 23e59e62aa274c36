"""Decompose the fused SA kernel's device time at the in-step SA0 shape
(N=2048, M=1024, K=32, C1=32 -> C2=64) with NOISE-SPREAD points (the
regime the 1000-step DDPM chain actually runs in: ball-query counts are
tiny and the count-gated chunks mostly skip).

Variants (kernel copies with phases elided):
  full      the production kernel
  bq_only   phase 1 without the gather dots / z_buf writes (d2 + cumsum
            + key build only)
  p1_only   phase 1 complete (ball query + selection gather + z_buf)
  no_max    full minus the final K-max fold

    python scripts/exp_sa_anatomy.py [spread|clustered]
"""
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lion_tpu.ops.pallas import sa_fused as sf

B = int(os.environ.get("SA_B", 16))
N = int(os.environ.get("SA_N", 2048))
M = int(os.environ.get("SA_M", 1024))
K = int(os.environ.get("SA_K", 32))
C1, C2 = 32, 64
RADIUS = 0.1
N_CALLS = 10


def make_kernel(mode):
    """A copy of sa_fused._sa_kernel with phases elided per `mode`."""
    def kern(k, n_layers, mt, eps, r2_ref, ctr_ref, pts_ref, a_ref,
             bc_ref, *rest):
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
        pts = pts_ref[0]
        a = a_ref[0]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        a_hl = jnp.concatenate([a_hi, a_lo], axis=0)
        c1 = a.shape[0]
        dott = functools.partial(lax.dot_general,
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        for t in range(ntile):
            ctr = ctr_ref[0, t * mt:(t + 1) * mt, :]
            d2 = jnp.zeros((mt, n), jnp.float32)
            for d in range(3):
                diff = ctr[:, d:d + 1] - pts[d:d + 1, :]
                d2 = d2 + diff * diff
            inball = d2 < r2
            rank = sf._lane_exclusive_cumsum(inball.astype(jnp.int32))
            count = rank[:, n - 1:n] + inball[:, n - 1:n]
            key = jnp.where(jnp.logical_and(inball, rank < k), rank, k)
            lane0 = lax.broadcasted_iota(jnp.int32, (mt, n), 1) == 0
            key = jnp.where(jnp.logical_and(count == 0, lane0), 0, key)
            cnt8 = dott(jnp.ones((8, n), jnp.bfloat16),
                        inball.astype(jnp.bfloat16))
            if mode == "bq_only":
                # park the ball-query results so nothing is DCE'd
                z_bufs[0][0:1, t * lt:(t + 1) * lt] = sf._tile_lanes(
                    (key[0:1, :mt] + count[0:1]).astype(jnp.bfloat16), k)
                continue
            cnt_max = (jnp.float32(0.0) if mode == "p1_nocnt"
                       else jnp.max(count))
            bounds = sorted(set(
                [0] + [bb for bb in (1, 2, 4) if bb < k]
                + list(range(8, k, 8)) + [k]))
            if mode in ("p1_slot0", "p1_nohl", "p1_noz", "p1_regsel", "p1_nocnt") or mode.startswith("p1_win"):
                bounds = [0, 1]
            if mode in ("p1_zonly", "p1_zrow"):
                bounds = [0]
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                def _chunk(s0=s0, s1=s1):
                    if mode.startswith("p1_win"):
                        ww = int(mode[6:])
                        for jj in range(s0, s1):
                            sel_buf[jj * mt:(jj + 1) * mt, :ww] = \
                                (key[:, :ww] == jj).astype(jnp.bfloat16)
                        g_buf[:, s0 * mt:s1 * mt] = \
                            dott(a_hl[:, :ww],
                                 sel_buf[s0 * mt:s1 * mt, :ww])
                        return
                    if mode == "p1_regsel":
                        g_buf[:, s0 * mt:s1 * mt] = \
                            dott(a_hl, (key == s0).astype(jnp.bfloat16))
                        return
                    for jj in range(s0, s1):
                        sel_buf[jj * mt:(jj + 1) * mt, :] = \
                            (key == jj).astype(jnp.bfloat16)
                    if mode == "p1_nohl":
                        g_buf[:c1, s0 * mt:s1 * mt] = \
                            dott(a_hi, sel_buf[s0 * mt:s1 * mt, :])
                    else:
                        g_buf[:, s0 * mt:s1 * mt] = \
                            dott(a_hl, sel_buf[s0 * mt:s1 * mt, :])
                if s0 == 0 or mode == "p1_nogate":
                    _chunk()
                else:
                    pl.when(cnt_max > s0)(_chunk)
            if mode == "p1_zonly":
                z_bufs[0][:, t * lt:(t + 1) * lt] = sf._tile_lanes(
                    bc_ref[0, :, t * mt:(t + 1) * mt],
                    lt // mt).astype(z_bufs[0].dtype)
                continue
            if mode == "p1_zrow":
                z_bufs[0][0:1, t * lt:(t + 1) * lt] = sf._tile_lanes(
                    bc_ref[0, 0:1, t * mt:(t + 1) * mt],
                    lt // mt).astype(z_bufs[0].dtype)
                continue
            if mode == "p1_noz":
                z_bufs[0][:, t * lt:(t + 1) * lt] = sf._tile_lanes(
                    g_buf[:c1, 0:mt], lt // mt).astype(z_bufs[0].dtype)
                continue
            ghl = g_buf[...]
            g = ghl[:c1] + ghl[c1:]
            z = g + sf._tile_lanes(bc_ref[0, :, t * mt:(t + 1) * mt]
                                   .astype(jnp.float32), k)
            cnt_t = sf._tile_lanes(cnt8[0:1], k)
            jlane = lax.broadcasted_iota(jnp.int32, (1, lt), 1) // mt
            miss = jlane >= jnp.maximum(cnt_t, 1.0).astype(jnp.int32)
            z = jnp.where(miss, sf._tile_lanes(z[:, :mt], k), z)
            z_bufs[0][:, t * lt:(t + 1) * lt] = z.astype(z_bufs[0].dtype)

        if mode in ("bq_only", "p1_only", "p1_slot0", "p1_nogate", "p1_nohl", "p1_noz", "p1_regsel", "p1_nocnt") or mode.startswith("p1_win") or mode in ("p1_zonly", "p1_zrow"):
            c_last = z_bufs[-1].shape[0]
            for t in range(ntile):
                out_ref[0, :, t * mt:(t + 1) * mt] = jnp.broadcast_to(
                    z_bufs[0][0:1, t * lt:t * lt + mt],
                    (c_last, mt)).astype(out_ref.dtype)
            return

        for li in range(n_layers):
            zb = z_bufs[li]
            c = zb.shape[0]
            s_c = jnp.zeros((c, 8), jnp.float32)
            for t in range(ntile):
                s_c = s_c + sf._col_sums(zb[:, t * lt:(t + 1) * lt])
            mu_c = sf._group_fold(s_c, 8, 1.0 / (m * k))[:, 0:1]
            v_c = jnp.zeros((c, 8), jnp.float32)
            for t in range(ntile):
                zc = zb[:, t * lt:(t + 1) * lt] - mu_c
                zcb = zc.astype(jnp.bfloat16)
                v_c = v_c + sf._col_sums(zcb * zcb)
            rs_c = lax.rsqrt(sf._group_fold(v_c, 8, 1.0 / (m * k))[:, 0:1]
                             + eps)
            ca = affs[2 * li][0].astype(jnp.float32)
            cb = affs[2 * li + 1][0].astype(jnp.float32)
            sc = rs_c * ca
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

        c_last = z_bufs[-1].shape[0]
        if mode == "no_max":
            for t in range(ntile):
                out_ref[0, :, t * mt:(t + 1) * mt] = \
                    h_buf[0:c_last, t * lt:t * lt + mt].astype(out_ref.dtype)
            return
        for t in range(ntile):
            h = h_buf[0:c_last, t * lt:(t + 1) * lt].astype(jnp.float32)
            w = lt
            while w > mt:
                w //= 2
                h = jnp.maximum(h[:, :w], h[:, w:2 * w])
            out_ref[0, :, t * mt:(t + 1) * mt] = h.astype(out_ref.dtype)
    return kern


def call_variant(mode, points, centers, a_t, bc, ws, bs, cas, cbs,
                 radius, k):
    b, n, _ = points.shape
    m = centers.shape[1]
    c1 = a_t.shape[1]
    n_layers = len(cas)
    c_last = cas[-1].shape[-1]
    c_max = max(ca.shape[-1] for ca in cas)
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
    for ca in cas:
        scratch.append(pltpu.VMEM((ca.shape[-1], m * k), jnp.bfloat16))
    scratch.append(pltpu.VMEM((c_max, m * k), jnp.bfloat16))
    scratch.append(pltpu.VMEM((2 * c1, mt * k), jnp.float32))
    return pl.pallas_call(
        functools.partial(make_kernel(mode), k, n_layers, mt, 1e-5),
        out_shape=jax.ShapeDtypeStruct((b, c_last, m), jnp.bfloat16),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_last, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
    )(*args)


def device_us(f, *args):
    out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    os.system("rm -rf /tmp/sa_an_trace")
    with jax.profiler.trace("/tmp/sa_an_trace"):
        for _ in range(N_CALLS):
            out = f(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    paths = glob.glob("/tmp/sa_an_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        tr = json.load(fh)
    pidn = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pidn.items() if "TPU" in n}
    ents = [e for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in dev
            and e.get("name", "").startswith("jit_run")]
    return sum(e.get("dur", 0) for e in ents) / max(len(ents), 1)


def main():
    regime = sys.argv[1] if len(sys.argv) > 1 else "spread"
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    scale = 1.0 if regime == "spread" else 0.3
    pts = jax.random.normal(keys[0], (B, N, 3), jnp.float32) * scale
    ctr = pts[:, :M, :]
    a_t = jax.random.normal(keys[1], (B, C1, N), jnp.float32)
    bc = jax.random.normal(keys[2], (B, C1, M), jnp.float32) * 0.1
    w2 = jax.random.normal(keys[3], (C2, C1), jnp.float32) * 0.2
    b2 = jax.random.normal(keys[4], (C2, 1), jnp.float32) * 0.1
    cas = (1.0 + 0.1 * jax.random.normal(keys[5], (B, C1)),
           1.0 + 0.1 * jax.random.normal(keys[6], (B, C2)))
    cbs = (0.1 * jax.random.normal(keys[7], (B, C1)),
           0.1 * jax.random.normal(keys[7], (B, C2)))

    for mode in tuple(os.environ.get("SA_MODES", "p1_slot0").split(",")):
        def run(pts, ctr, a_t, bc, w2, b2, c0, c1_, d0, d1, mode=mode):
            return call_variant(mode, pts, ctr, a_t, bc, (w2,), (b2,),
                                (c0, c1_), (d0, d1), RADIUS, K)
        f = jax.jit(run)
        us = device_us(f, pts, ctr, a_t, bc, w2, b2,
                       cas[0], cas[1], cbs[0], cbs[1])
        print(f"{regime:9s} {mode:8s} {us:8.1f} us/call")


if __name__ == "__main__":
    main()
