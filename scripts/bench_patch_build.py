"""Microbench: patch-build strategies for the r=32 conv at 128 dense lanes.

A: strided-slice copies from a (34,34,128) halo scratch (current style)
B: pltpu.roll on the flattened (1160,128) halo (one rotate per tap)
C: matmul only (no patch build) — isolates the MXU share

Each kernel runs the patch build + one (rows,1152)@(1152,128) matmul per
grid step; grid of 64 steps inside a 10-iter scan.
"""
import functools
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

R = 32
ROWS = (R + 2) * (R + 2)          # 1156
ROWSP = ((ROWS + 7) // 8) * 8     # 1160
K = 9 * 128
N = 128
STEPS = 64
ITERS = 10


def kern_slices(x_ref, w_ref, o_ref, halo, p_buf):
    halo[...] = x_ref[0, :ROWS].reshape(34, 34, 128)
    for kh in range(3):
        for kw in range(3):
            t = kh * 3 + kw
            p_buf[:, t * 128:(t + 1) * 128] = \
                halo[kh:kh + R, kw:kw + R, :].reshape(R * R, 128)
    o_ref[0] = jax.lax.dot_general(
        p_buf[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)[:R * R]


def kern_roll(x_ref, w_ref, o_ref, p_buf):
    flat = x_ref[0]                      # (ROWSP, 128)
    for kh in range(3):
        for kw in range(3):
            t = kh * 3 + kw
            s = (ROWSP - (kh * 34 + kw)) % ROWSP
            p_buf[:, t * 128:(t + 1) * 128] = (
                flat if s == 0 else jnp.roll(flat, s, 0))


def kern_concat(x_ref, w_ref, o_ref, p_buf):
    flat = x_ref[0]                      # (ROWSP, 128)
    for kh in range(3):
        for kw in range(3):
            t = kh * 3 + kw
            s = kh * 34 + kw
            if s == 0:
                p_buf[:, t * 128:(t + 1) * 128] = flat
            else:
                p_buf[:, t * 128:(t + 1) * 128] = jnp.concatenate(
                    [flat[s:], flat[:s]], axis=0)
    o_ref[0] = jax.lax.dot_general(
        p_buf[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def kern_mm(x_ref, w_ref, o_ref, p_buf):
    for t in range(9):
        p_buf[:, t * 128:(t + 1) * 128] = x_ref[0]
    o_ref[0] = jax.lax.dot_general(
        p_buf[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def kern_stores(x_ref, w_ref, o_ref, p_buf):
    for t in range(9):
        p_buf[:, t * 128:(t + 1) * 128] = x_ref[0]
    o_ref[0] = p_buf[:, :128]


def kern_mmonly(x_ref, w_ref, o_ref, p_buf):
    o_ref[0] = jax.lax.dot_general(
        p_buf[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def kern_nop(x_ref, w_ref, o_ref, p_buf):
    o_ref[0] = x_ref[0]


def run(name, kern, rows_in, rows_out, scratch):
    x = jax.random.normal(jax.random.PRNGKey(0), (STEPS, rows_in, 128),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    f = pl.pallas_call(
        kern, grid=(STEPS,),
        in_specs=[pl.BlockSpec((1, rows_in, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, rows_out, N), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((STEPS, rows_out, N), jnp.bfloat16),
        scratch_shapes=scratch)

    @jax.jit
    def loop(x, w):
        def step(c, _):
            y = f(c, w)
            return jnp.concatenate(
                [y, jnp.zeros((STEPS, rows_in - rows_out, 128),
                              jnp.bfloat16)], axis=1) if rows_out != rows_in \
                else y, ()
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    out = loop(x, w)
    _ = float(out.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = loop(x, w)
    _ = float(out.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / ITERS / STEPS * 1e6
    fl = 2 * rows_out * K * N
    print(f"{name:<10s} {dt:8.2f} us/step   MXU-equiv {fl/(dt*1e-6)/197e12*100:5.1f}%")
    return dt


def main():
    run("slices", kern_slices, ROWSP, R * R,
        [pltpu.VMEM((34, 34, 128), jnp.bfloat16),
         pltpu.VMEM((R * R, K), jnp.bfloat16)])
    run("roll", kern_roll, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])
    run("concat", kern_concat, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])
    run("copies+mm", kern_mm, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])
    run("stores", kern_stores, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])
    run("mm-only", kern_mmonly, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])
    run("nop", kern_nop, ROWSP, ROWSP,
        [pltpu.VMEM((ROWSP, K), jnp.bfloat16)])


def trace_device():
    """Re-run all variants under jax.profiler.trace and report true device
    duration per pallas kernel."""
    import collections, glob, gzip, json
    os.system("rm -rf /tmp/patch_trace")
    with jax.profiler.trace("/tmp/patch_trace"):
        main()
    paths = glob.glob("/tmp/patch_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    agg = collections.Counter(); cnt = collections.Counter()
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        n = e.get("name", "").split(".")[0]
        if "kern_" in n or "pallas" in n:
            agg[n] += e.get("dur", 0); cnt[n] += 1
    print("\ndevice durations (us per pallas call / per grid step):")
    for k, v in agg.most_common():
        per_call = v / cnt[k]
        print(f"  {k:<40s} {per_call:9.1f} us/call  "
              f"{per_call/STEPS:7.2f} us/step  (n={cnt[k]})")


if __name__ == "__main__":
    trace_device()
