"""Attribution experiment for the whole-item packed conv kernel at
r=32 C=64 (the dominant step cost): time stripped variants to find where
the 1.18ms/call (B=16) goes vs the ~0.78ms matmul roofline.

Variants (timing only; results wrong for stripped ones):
  full        the real kernel path (stats on)
  nostats     stats dots removed
  noedge      ey_buf build + edge matmuls removed
  nofill      taps read the center slab without shift masking (reuses one
              unshifted copy; 1 fill instead of 3+3)
  mmonly      matmuls against the raw input block only
"""
import functools
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, R, C = 16, 32, 64
G = 128 // C
NG = (R * C) // 128
N_CALLS = 10


def make_kernel(variant):
    r, ci, g, ng = R, C, G, NG
    r2 = r * r
    rc = ng * 128
    want_stats = variant in ("full", "foldstats")

    def kern(*refs):
        x_ref, wm_ref, we_ref = refs[:3]
        rest = refs[3:]
        if want_stats:
            out_ref, st_ref = rest[:2]
            bufs = rest[2:]
        else:
            out_ref = rest[0]
            st_ref = None
            bufs = rest[1:]
        y_buf = bufs[0]
        ey_buf = bufs[1] if variant not in ("noedge", "mmonly") else None

        rowi = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
        yq = rowi % r
        mask_lo = yq != 0
        mask_hi = yq != r - 1

        @pl.when(pl.program_id(0) == 0)
        def _():
            y_buf[:, :r] = jnp.zeros_like(y_buf[:, :r])
            y_buf[:, r + r2:] = jnp.zeros_like(y_buf[:, r + r2:])
            if ey_buf is not None:
                ey_buf[:, :r] = jnp.zeros_like(ey_buf[:, :r])
                ey_buf[:, r + r2:] = jnp.zeros_like(ey_buf[:, r + r2:])

        v = x_ref[0]
        if variant == "mmonly":
            y_buf[1, r:r + r2] = v
        elif variant == "nofill":
            shifts = [v]
            y_buf[1, r:r + r2] = v
            if ey_buf is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r2, rc), 1) % 128
                zc = jnp.zeros((r2, ci), y_buf.dtype)
                zn = jnp.zeros((r2, 128 - ci), y_buf.dtype)
                yv = v
                pr = jnp.concatenate([zc, yv[:, :rc - ci]], axis=1)
                nx = jnp.concatenate([yv[:, 128 - ci:], zn], axis=1)
                ey_buf[1, r:r + r2] = jnp.where(
                    lane < ci, pr, jnp.where(lane < 2 * ci, nx, 0))
        else:
            shifts = [
                jnp.where(mask_lo,
                          jnp.concatenate([v[r2 - 1:], v[:r2 - 1]], axis=0),
                          0),
                v,
                jnp.where(mask_hi,
                          jnp.concatenate([v[1:], v[:1]], axis=0), 0),
            ]
            for s in range(3):
                y_buf[s, r:r + r2] = shifts[s]
            if ey_buf is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (r2, rc), 1) % 128
                zc = jnp.zeros((r2, ci), y_buf.dtype)
                zn = jnp.zeros((r2, 128 - ci), y_buf.dtype)
                for s in range(3):
                    yv = shifts[s]
                    pr = jnp.concatenate([zc, yv[:, :rc - ci]], axis=1)
                    nx = jnp.concatenate([yv[:, 128 - ci:], zn], axis=1)
                    ey_buf[s, r:r + r2] = jnp.where(
                        lane < ci, pr, jnp.where(lane < 2 * ci, nx, 0))

        mm = functools.partial(jax.lax.dot_general,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        ones = jnp.ones((8, r2), jnp.bfloat16)
        s1_acc = s2_acc = None
        for gg in range(ng):
            lo = gg * 128
            acc = None
            for tap in range(9):
                t0, t1 = tap // 3 - 1, tap % 3 - 1
                sl = 1 if variant in ("mmonly", "nofill") else t1 + 1
                a = y_buf[sl, r + t0 * r:r + t0 * r + r2, lo:lo + 128]
                d = mm(a, wm_ref[tap * 128:(tap + 1) * 128, :])
                acc = d if acc is None else acc + d
            if ey_buf is not None:
                for tap in range(9):
                    t0, t1 = tap // 3 - 1, tap % 3 - 1
                    sl = 1 if variant in ("mmonly", "nofill") else t1 + 1
                    acc += mm(ey_buf[sl, r + t0 * r:r + t0 * r + r2,
                                     lo:lo + 128],
                              we_ref[tap * 128:(tap + 1) * 128, :])
            out_ref[0, :, lo:lo + 128] = acc.astype(out_ref.dtype)

            if st_ref is not None and variant == "foldstats":
                # VPU sublane row-folds of the ROUNDED block output:
                # avoids the M=8 ones-dot MXU underfill
                yb = acc.astype(out_ref.dtype)
                h1 = yb.astype(jnp.float32)
                h2 = (yb * yb).astype(jnp.float32)
                rows = r2
                while rows > 1:
                    rows //= 2
                    h1 = h1[:rows] + h1[rows:2 * rows]
                    h2 = h2[:rows] + h2[rows:2 * rows]
                s1_acc = h1 if s1_acc is None else s1_acc + h1
                s2_acc = h2 if s2_acc is None else s2_acc + h2
            elif st_ref is not None:
                y_hi = acc.astype(jnp.bfloat16)
                y_lo = (acc - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                y2 = acc * acc
                y2_hi = y2.astype(jnp.bfloat16)
                y2_lo = (y2 - y2_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                s1 = (mm(ones, y_hi) + mm(ones, y_lo))[0:1]
                s2 = (mm(ones, y2_hi) + mm(ones, y2_lo))[0:1]
                s1_acc = s1 if s1_acc is None else s1_acc + s1
                s2_acc = s2 if s2_acc is None else s2_acc + s2

        if st_ref is not None:
            w_ = 128
            s1, s2 = s1_acc, s2_acc
            while w_ > ci:
                w_ //= 2
                s1 = s1[:, :w_] + s1[:, w_:2 * w_]
                s2 = s2[:, :w_] + s2[:, w_:2 * w_]
            st_ref[...] = jnp.concatenate([s1, s2], axis=0)[None]

    return kern, want_stats


def build_call(variant):
    from lion_tpu.ops.pallas.conv3d_packed import pack_weights_item
    r, ci, g, ng = R, C, G, NG
    r2, rc = r * r, r * ci
    kern, want_stats = make_kernel(variant)
    key = jax.random.PRNGKey(0)
    xp = jax.random.normal(key, (B, r2, rc), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, ci, ci), jnp.float32) * 0.05
    wm, we = pack_weights_item(w, g)
    wm = wm.astype(jnp.bfloat16)
    we = we.astype(jnp.bfloat16)

    in_specs = [pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0)),
                pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0))]
    out_specs = [pl.BlockSpec((1, r2, rc), lambda bi: (bi, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((B, r2, rc), xp.dtype)]
    scratch = [pltpu.VMEM((3, r + r2 + r, rc), xp.dtype)]
    if variant not in ("noedge", "mmonly"):
        scratch.append(pltpu.VMEM((3, r + r2 + r, rc), xp.dtype))
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, ci), lambda bi: (bi, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, 2, ci), jnp.float32))

    f = pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20))

    @jax.jit
    def many(x):
        outs = []
        for i in range(N_CALLS):
            o = f(x + jnp.bfloat16(i * 1e-3), wm, we)
            if isinstance(o, (tuple, list)):
                o = o[0]
            outs.append(o[:, 0, 0])
        return outs

    return many, xp


def device_us(f, *args):
    out = f(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/cv_trace")
    with jax.profiler.trace("/tmp/cv_trace"):
        out = f(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/cv_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        tr = json.load(fh)
    pidn = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pidn.items() if "TPU" in n}
    tot = cnt = 0
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in dev
                and e.get("args", {}).get("hlo_category") == "custom-call"):
            tot += e.get("dur", 0)
            cnt += 1
    return tot / max(cnt, 1), cnt


def main():
    for variant in ["full", "foldstats", "nostats", "noedge", "nofill", "mmonly"]:
        f, xp = build_call(variant)
        us, cnt = device_us(f, xp)
        print(f"{variant:<10s} {us:8.1f} us/call  (n={cnt})")


if __name__ == "__main__":
    main()
