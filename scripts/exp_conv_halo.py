"""Model the real pair-kernel structure at (r=32, C=64, g=2) and compare:

A) current: 3 plain + 3 lane-rolled-edge full-width slab fills per item,
   per block 18 aligned K=128 dots (+adds)
B) halo: ONLY the 3 plain fills (into a lane-guarded slab), per block
   9 K=256 dots whose operands are 64-lane-offset windows

    python scripts/exp_conv_halo.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, R, CI = 16, 32, 64
R2, RC = R * R, R * CI
NG = RC // 128
SLABR = R + R2 + R

mm = functools.partial(jax.lax.dot_general,
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)


def fills(x_ref, y_buf, wide):
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
    yq = rowi % R
    mask_lo = yq != 0
    mask_hi = yq != R - 1
    v = x_ref[0]
    lo = 128 if wide else 0
    y_buf[0, R:R + R2, lo:lo + RC] = jnp.where(
        mask_lo, jnp.concatenate([v[R2 - 1:], v[:R2 - 1]], axis=0), 0)
    y_buf[1, R:R + R2, lo:lo + RC] = v
    y_buf[2, R:R + R2, lo:lo + RC] = jnp.where(
        mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)
    return mask_lo, mask_hi


def kern_bisect(nmain, nedge, x_ref, w_ref, we_ref, out_ref, y_buf, ey_buf):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for b in (y_buf, ey_buf):
            b[:, :R] = jnp.zeros_like(b[:, :R])
            b[:, R + R2:] = jnp.zeros_like(b[:, R + R2:])
    mask_lo, mask_hi = fills(x_ref, y_buf, False)
    v = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R2, RC), 1) % 128
    shifts = [jnp.where(mask_lo, jnp.concatenate(
        [v[R2 - 1:], v[:R2 - 1]], axis=0), 0), v,
        jnp.where(mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)]
    for s2 in range(3):
        yv = shifts[s2]
        pr = jnp.concatenate(
            [jnp.zeros((R2, CI), y_buf.dtype), yv[:, :RC - CI]], axis=1)
        nx = jnp.concatenate(
            [yv[:, 128 - CI:], jnp.zeros((R2, 128 - CI), y_buf.dtype)],
            axis=1)
        ey_buf[s2, R:R + R2] = jnp.where(lane < CI, pr, nx)
    for gg in range(NG):
        lo = gg * 128
        acc = jnp.zeros((R2, 128), jnp.float32)
        for tap in range(nmain):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            acc += mm(y_buf[t1 + 1, R + t0 * R:R + t0 * R + R2,
                            lo:lo + 128],
                      w_ref[tap * 128:(tap + 1) * 128, :])
        for tap in range(nedge):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            acc += mm(
                ey_buf[t1 + 1, R + t0 * R:R + t0 * R + R2, lo:lo + 128],
                we_ref[tap * 128:(tap + 1) * 128, :])
        out_ref[0, gg] = acc.astype(out_ref.dtype)


def kern_current(x_ref, w_ref, we_ref, out_ref, y_buf, ey_buf):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for b in (y_buf, ey_buf):
            b[:, :R] = jnp.zeros_like(b[:, :R])
            b[:, R + R2:] = jnp.zeros_like(b[:, R + R2:])

    mask_lo, mask_hi = fills(x_ref, y_buf, False)
    v = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R2, RC), 1) % 128

    def rsh(yv, s):
        return jnp.concatenate(
            [jnp.zeros((R2, s), y_buf.dtype), yv[:, :RC - s]], axis=1)

    def lsh(yv, s):
        return jnp.concatenate(
            [yv[:, s:], jnp.zeros((R2, s), y_buf.dtype)], axis=1)

    shifts = [jnp.where(mask_lo, jnp.concatenate(
        [v[R2 - 1:], v[:R2 - 1]], axis=0), 0), v,
        jnp.where(mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)]
    for s in range(3):
        yv = shifts[s]
        pr = rsh(yv, CI)
        nx = lsh(yv, 128 - CI)
        ey_buf[s, R:R + R2] = jnp.where(lane < CI, pr, nx)

    for gg in range(NG):
        lo = gg * 128
        acc = None
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            d = mm(y_buf[t1 + 1, R + t0 * R:R + t0 * R + R2, lo:lo + 128],
                   w_ref[tap * 128:(tap + 1) * 128, :])
            acc = d if acc is None else acc + d
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            acc += mm(
                ey_buf[t1 + 1, R + t0 * R:R + t0 * R + R2, lo:lo + 128],
                we_ref[tap * 128:(tap + 1) * 128, :])
        out_ref[0, gg] = acc.astype(out_ref.dtype)


def kern_halo(x_ref, w_ref, we_ref, out_ref, y_buf):
    @pl.when(pl.program_id(0) == 0)
    def _():
        y_buf[:, :R] = jnp.zeros_like(y_buf[:, :R])
        y_buf[:, R + R2:] = jnp.zeros_like(y_buf[:, R + R2:])
        y_buf[:, :, :128] = jnp.zeros_like(y_buf[:, :, :128])
        y_buf[:, :, 128 + RC:] = jnp.zeros_like(y_buf[:, :, 128 + RC:])

    fills(x_ref, y_buf, True)
    for gg in range(NG):
        lo = 128 + gg * 128 - 64
        acc = None
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            d = mm(y_buf[t1 + 1, R + t0 * R:R + t0 * R + R2, lo:lo + 256],
                   w_ref[tap * 256:(tap + 1) * 256, :])
            acc = d if acc is None else acc + d
        out_ref[0, gg] = acc.astype(out_ref.dtype)


import glob
import gzip
import json


def device_us(g, *args):
    out = g(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/ch_trace")
    with jax.profiler.trace("/tmp/ch_trace"):
        out = g(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/ch_trace/**/*.trace.json.gz", recursive=True)
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


def run(label, kfn, wk, scratch):
    x = jnp.asarray(np.random.randn(B, R2, RC), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(wk, 128), jnp.bfloat16)
    we = jnp.asarray(np.random.randn(9 * 128, 128), jnp.bfloat16)
    f = pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((B, NG, R2, 128), jnp.bfloat16),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R2, RC), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((wk, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9 * 128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NG, R2, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20),
    )

    @jax.jit
    def many(x, w, we):
        return [f(x + i, w, we)[:, 0, 0, :1] for i in range(8)]

    us, cnt = device_us(many, x, w, we)
    print(f"{label}: {us:8.1f} us/call (n={cnt})")


if __name__ == "__main__":
    two = [pltpu.VMEM((3, SLABR, RC), jnp.bfloat16),
           pltpu.VMEM((3, SLABR, RC), jnp.bfloat16)]
    run("fills only      ", functools.partial(kern_bisect, 0, 0),
        9 * 128, two)
    run("fills+1main     ", functools.partial(kern_bisect, 1, 0),
        9 * 128, two)
    run("fills+3main     ", functools.partial(kern_bisect, 3, 0),
        9 * 128, two)
    run("fills+9main     ", functools.partial(kern_bisect, 9, 0),
        9 * 128, two)
    run("fills+9m+9e     ", functools.partial(kern_bisect, 9, 9),
        9 * 128, two)
    run("current(18xK128)", kern_current, 9 * 128, two)
    run("halo   (9xK256) ", kern_halo, 9 * 256, [
        pltpu.VMEM((3, SLABR, RC + 256), jnp.bfloat16)])
