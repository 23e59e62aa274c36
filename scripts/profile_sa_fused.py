"""Correctness + device timing for the fused SA-block kernel vs the
modular path (XLA ball_query_group + dense/GN/swish/max) at the local
prior's three SA shapes."""
import functools
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
K = 32


def gn8(x, eps=1e-5):
    # x (..., C) -> parameter-free GroupNorm over 8 channel groups
    c = x.shape[-1]
    xs = x.reshape(x.shape[:-1] + (8, c // 8))
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.var(xs, axis=-1, keepdims=True)
    return ((xs - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)


def modular(pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2, radius):
    from lion_tpu.ops.points import _ball_query_group_xla
    grouped = _ball_query_group_xla(pts, ctr, feats, radius, K, True)
    z1 = (grouped.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)
          ).astype(jnp.float32) + b1
    h1 = gn8(z1) * ca1[:, None, None, :] + cb1[:, None, None, :]
    h1 = h1 * jax.nn.sigmoid(h1)
    z2 = (h1.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)
          ).astype(jnp.float32) + b2
    h2 = gn8(z2) * ca2[:, None, None, :] + cb2[:, None, None, :]
    h2 = h2 * jax.nn.sigmoid(h2)
    return jnp.max(h2, axis=2)                        # (B, M, C2)


def fused(pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2, radius):
    from lion_tpu.ops.pallas.sa_fused import pointnet_sa_fused_pallas
    a = ((jnp.concatenate([pts, feats], axis=-1).astype(jnp.bfloat16)
          @ w1.astype(jnp.bfloat16)).astype(jnp.float32) + b1)
    a_t = jnp.transpose(a, (0, 2, 1))
    bc = -jnp.einsum("bmd,dc->bcm", ctr.astype(jnp.bfloat16),
                     w1[:3].astype(jnp.bfloat16)).astype(jnp.float32)
    out = pointnet_sa_fused_pallas(
        pts, ctr, a_t, bc, (jnp.transpose(w2),), (b2[:, None],),
        (ca1, ca2), (cb1, cb2), radius, K)
    return jnp.transpose(out, (0, 2, 1)).astype(jnp.float32)


def device_us(f, *args):
    out = f(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    os.system("rm -rf /tmp/sa_trace")
    with jax.profiler.trace("/tmp/sa_trace"):
        out = f(*args)
        _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in out))
    paths = glob.glob("/tmp/sa_trace/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        tr = json.load(fh)
    pidn = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pidn.items() if "TPU" in n}
    tot = 0
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e.get("name", "")
            if e.get("args", {}).get("hlo_category") == "custom-call" \
                    or "jit_" in name:
                pass
    # total device time across all events at top level: use sum of
    # durations of events with no parent is hard; instead sum custom-call
    # + fusion + convert etc. Simpler: sum ALL 'X' events whose name is a
    # jit entry
    ents = [e for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in dev
            and e.get("name", "").startswith("jit_many")]
    tot = sum(e.get("dur", 0) for e in ents)
    return tot / max(len(ents), 1) / N_CALLS


def main():
    for n, m, c, c2, radius in [(2048, 1024, 32, 64, 0.1),
                                (1024, 256, 64, 128, 0.2),
                                (256, 64, 128, 128, 0.4)]:
        c1 = c  # first MLP width == first out channel in LION SA specs
        cc1 = {32: 32, 64: 64, 128: 128}[c]
        keys = jax.random.split(jax.random.PRNGKey(n + c), 10)
        pts = jax.random.normal(keys[0], (B, n, 3), jnp.float32) * 0.3
        ctr = pts[:, :m, :]
        feats = (jax.random.normal(keys[1], (B, n, c), jnp.float32)
                 ).astype(jnp.bfloat16)
        w1 = jax.random.normal(keys[2], (3 + c, cc1), jnp.float32) * 0.2
        b1 = jax.random.normal(keys[3], (cc1,), jnp.float32) * 0.1
        w2 = jax.random.normal(keys[4], (cc1, c2), jnp.float32) * 0.2
        b2 = jax.random.normal(keys[5], (c2,), jnp.float32) * 0.1
        ca1 = 1.0 + 0.1 * jax.random.normal(keys[6], (B, cc1))
        cb1 = 0.1 * jax.random.normal(keys[7], (B, cc1))
        ca2 = 1.0 + 0.1 * jax.random.normal(keys[8], (B, c2))
        cb2 = 0.1 * jax.random.normal(keys[9], (B, c2))

        args = (pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2, radius)
        ref = jax.jit(functools.partial(modular, radius=radius))(*args[:-1])
        got = jax.jit(functools.partial(fused, radius=radius))(*args[:-1])
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"N={n} M={m} C={c}->{c2}: max|err|={err:.4f} "
              f"(max|ref|={scale:.2f})")

        @jax.jit
        def many_mod(pts, ctr, feats):
            return [modular(pts, ctr, feats + jnp.bfloat16(i * 1e-3),
                            *args[3:-1], radius=radius)[:, 0, 0]
                    for i in range(N_CALLS)]

        @jax.jit
        def many_fus(pts, ctr, feats):
            return [fused(pts, ctr, feats + jnp.bfloat16(i * 1e-3),
                          *args[3:-1], radius=radius)[:, 0, 0]
                    for i in range(N_CALLS)]

        us_m = device_us(many_mod, pts, ctr, feats)
        us_f = device_us(many_fus, pts, ctr, feats)
        print(f"  modular {us_m:9.1f} us/call   fused {us_f:9.1f} us/call")


if __name__ == "__main__":
    main()
