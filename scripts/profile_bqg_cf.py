"""Correctness + device timing for ball_query_group_cf_pallas vs the
row-layout ball_query_group_pallas at the sampling-step hot shapes."""
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
N_CALLS = 10


def device_us(f, *args):
    out = f(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/bq_trace")
    with jax.profiler.trace("/tmp/bq_trace"):
        out = f(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/bq_trace/**/*.trace.json.gz", recursive=True)
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
    from lion_tpu.ops.pallas.ball_query_group import (
        ball_query_group_cf_pallas, ball_query_group_pallas)
    from lion_tpu.ops.points import _ball_query_group_xla

    for n, m, c, r in [(2048, 1024, 32, 0.1), (1024, 256, 64, 0.2),
                       (256, 64, 128, 0.4)]:
        k = 32
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(n + c), 3)
        pts = jax.random.normal(k0, (B, n, 3), jnp.float32) * 0.3
        ctr = pts[:, :m, :]
        feats = jax.random.normal(k2, (B, n, c), jnp.float32) \
            .astype(jnp.bfloat16)

        row = ball_query_group_pallas(pts, ctr, feats, r, k, True)
        cf = ball_query_group_cf_pallas(pts, ctr, feats, r, k)
        ref = _ball_query_group_xla(pts, ctr, feats, r, k, True)
        cf_as_row = jnp.transpose(cf, (0, 3, 1, 2))
        err_row = float(jnp.max(jnp.abs(row - ref)))
        err_cf = float(jnp.max(jnp.abs(cf_as_row - ref)))
        print(f"N={n} M={m} C={c}: max|row-ref|={err_row:.2e} "
              f"max|cf-ref|={err_cf:.2e}")

        @jax.jit
        def many_row(p, ct, f):
            return [ball_query_group_pallas(p, ct, f + i, r, k, True)[:, 0, 0]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_cf(p, ct, f):
            return [ball_query_group_cf_pallas(p, ct, f + i, r, k)[:, 0, 0]
                    for i in range(N_CALLS)]

        us_row, _ = device_us(many_row, pts, ctr, feats)
        us_cf, _ = device_us(many_cf, pts, ctr, feats)
        print(f"  row {us_row:8.1f} us   cf {us_cf:8.1f} us")


if __name__ == "__main__":
    main()
