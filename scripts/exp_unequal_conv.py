"""The two unequal-channel conv shapes in the local prior step —
(r=8, 192->128) and (r=16, 128->64) — via: the current conv3d_3x3_fused
pallas path, XLA's native conv emitter, and an im2col matmul (batch in M,
true-MAC K). Device-time via trace.

    python scripts/exp_unequal_conv.py
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
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
N_CALLS = 8


def device_us(g, *args):
    out = g(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/uc_trace")
    with jax.profiler.trace("/tmp/uc_trace"):
        out = g(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/uc_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        tr = json.load(fh)
    pidn = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pidn.items() if "TPU" in n}
    ents = [e for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in dev
            and e.get("name", "").startswith("jit_many")]
    return sum(e.get("dur", 0) for e in ents) / max(len(ents), 1) / N_CALLS


def im2col_conv(x, w):
    # x (B, R, R, R, CI) bf16, w (3, 3, 3, CI, CO) -> (B, R, R, R, CO)
    b, r, _, _, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dx:dx + r, dy:dy + r, dz:dz + r, :]
            for dx in range(3) for dy in range(3) for dz in range(3)]
    p = jnp.concatenate(cols, axis=-1).reshape(b * r * r * r, 27 * ci)
    wf = w.reshape(27 * ci, co)
    y = jax.lax.dot_general(p, wf.astype(x.dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(b, r, r, r, co).astype(x.dtype)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    from lion_tpu.ops.pallas.conv3d import conv3d_3x3_fused
    for r, ci, co in [(8, 192, 128), (16, 128, 64)]:
        k0, k1 = jax.random.split(jax.random.PRNGKey(r + ci))
        x = jax.random.normal(k0, (B, r, r, r, ci), jnp.bfloat16)
        w = jax.random.normal(k1, (3, 3, 3, ci, co), jnp.float32) * 0.1
        bound = 2 * B * r ** 3 * 27 * ci * co / 197e6

        @jax.jit
        def many_cur(x, w):
            return [conv3d_3x3_fused(x + i, w)[:, 0, 0, 0, :1]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_xla(x, w):
            return [xla_conv(x + i, w)[:, 0, 0, 0, :1]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_im2col(x, w):
            return [im2col_conv(x + i, w)[:, 0, 0, 0, :1]
                    for i in range(N_CALLS)]

        # parity sanity
        a = np.asarray(conv3d_3x3_fused(x, w), np.float32)
        c = np.asarray(im2col_conv(x, w), np.float32)
        err = np.abs(a - c).max() / max(np.abs(a).max(), 1e-6)
        us_cur = device_us(many_cur, x, w)
        us_xla = device_us(many_xla, x, w)
        us_i2c = device_us(many_im2col, x, w)
        print(f"r={r} {ci}->{co} (bound {bound:5.1f}us): "
              f"cur {us_cur:6.1f}  xla {us_xla:6.1f}  "
              f"im2col {us_i2c:6.1f}  relerr {err:.4f}")


if __name__ == "__main__":
    main()
