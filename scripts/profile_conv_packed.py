"""TPU check + timing for conv3d_packed_fused at the r=32 hot shapes.
Parity vs conv3d_3x3_fused (bf16 tolerance), then device timing from a
profiler trace of N back-to-back calls inside one jit (no scan carry).
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
N_CALLS = 10


def main():
    from lion_tpu.ops.pallas.conv3d import conv3d_3x3_fused
    from lion_tpu.ops.pallas.conv3d_packed import conv3d_packed_fused

    for r, c in [(32, 32), (32, 64), (16, 128), (16, 64), (8, 128)]:
        k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(r + c), 4)
        x5 = jax.random.normal(k0, (B, r, r, r, c), jnp.bfloat16)
        w = (jax.random.normal(k1, (3, 3, 3, c, c), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
        sc = 1.0 + 0.1 * jax.random.normal(k2, (B, c))
        bi = 0.1 * jax.random.normal(k3, (B, c))
        xp = x5.reshape(B, r * r, r * c)

        yp, stp = conv3d_packed_fused(xp, w, r, in_scale=sc, in_bias=bi,
                                      pre_swish=True, want_stats=True)
        y5, st5 = conv3d_3x3_fused(x5, w, in_scale=sc, in_bias=bi,
                                   pre_swish=True, want_stats=True)
        a = jnp.asarray(yp, jnp.float32).reshape(B, r, r, r, c)
        bq = jnp.asarray(y5, jnp.float32)
        err = float(jnp.max(jnp.abs(a - bq)))
        sterr = float(jnp.max(jnp.abs(stp - st5) / (jnp.abs(st5) + 1.0)))
        print(f"r={r} c={c}: max|packed-5d|={err:.4f} strel={sterr:.5f}")

        # timing: N back-to-back independent calls in one jit
        xs_p = jnp.stack([xp + i * 0 for i in range(N_CALLS)])
        xs_5 = jnp.stack([x5 + i * 0 for i in range(N_CALLS)])

        @jax.jit
        def many_packed(xs):
            return [conv3d_packed_fused(xs[i] + i, w, r, in_scale=sc,
                                        in_bias=bi, pre_swish=True,
                                        want_stats=True)[0][0, 0, 0]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_5d(xs):
            return [conv3d_3x3_fused(xs[i] + i, w, in_scale=sc, in_bias=bi,
                                     pre_swish=True,
                                     want_stats=True)[0][0, 0, 0, 0, 0]
                    for i in range(N_CALLS)]

        for name, f, xs in [("packed", many_packed, xs_p),
                            ("5d", many_5d, xs_5)]:
            out = f(xs)
            _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
            os.system("rm -rf /tmp/convp_trace")
            with jax.profiler.trace("/tmp/convp_trace"):
                out = f(xs)
                _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
            paths = glob.glob("/tmp/convp_trace/**/*.trace.json.gz",
                              recursive=True)
            with gzip.open(sorted(paths)[-1], "rt") as fh:
                tr = json.load(fh)
            pidn = {e.get("pid"): e.get("args", {}).get("name", "")
                    for e in tr["traceEvents"]
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            dev = {p for p, n in pidn.items() if "TPU" in n}
            tot = cnt = 0
            for e in tr["traceEvents"]:
                if (e.get("ph") == "X" and e.get("pid") in dev and
                        e.get("args", {}).get("hlo_category")
                        == "custom-call"):
                    tot += e.get("dur", 0); cnt += 1
            print(f"  {name:<8s} {tot/max(cnt,1):8.1f} us/call (n={cnt})")


if __name__ == "__main__":
    main()
