"""Per-shape device timing for avg_voxelize_pallas / trilinear_devoxelize
at the sampling-step hot shapes, from a profiler trace of N back-to-back
calls inside one jit."""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
N_CALLS = 10


def device_us(f, *args):
    out = f(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/vd_trace")
    with jax.profiler.trace("/tmp/vd_trace"):
        out = f(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/vd_trace/**/*.trace.json.gz", recursive=True)
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
    from lion_tpu.ops.pallas.voxelize import avg_voxelize_pallas
    from lion_tpu.ops.pallas.devox import trilinear_devoxelize_pallas

    for r, c, n in [(32, 32, 2048), (32, 64, 2048), (16, 64, 1024),
                    (16, 128, 1024), (8, 128, 256)]:
        k0, k1 = jax.random.split(jax.random.PRNGKey(r + c + n))
        f = jax.random.normal(k0, (B, n, c), jnp.float32)
        pts = jax.random.uniform(k1, (B, n, 3), jnp.float32,
                                 0.0, r - 1.001)
        vcoords = pts.astype(jnp.int32)
        grid = jax.random.normal(k0, (B, r, r, r, c), jnp.bfloat16)
        bound_v = 2 * B * r * r * n * ((r * c + r + 127) // 128 * 128) / 197e6
        bound_d = 2 * B * n * r * r * r * c / 197e6

        @jax.jit
        def many_v(f, vc):
            return [avg_voxelize_pallas(f + i, vc, r)[:, 0, 0, 0]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_d(g, p):
            return [trilinear_devoxelize_pallas(g + i, p, r)[:, 0]
                    for i in range(N_CALLS)]

        us_v, cv = device_us(many_v, f, vcoords)
        us_d, cd = device_us(many_d, grid, pts)
        print(f"r={r:3d} c={c:4d} n={n:5d}: vox {us_v:7.1f} us "
              f"(bound {bound_v:6.1f})  devox {us_d:7.1f} us "
              f"(bound {bound_d:6.1f})")


if __name__ == "__main__":
    main()
