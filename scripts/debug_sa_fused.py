"""Bisect the SA0-shape error in the fused SA kernel: vary radius and
feature scale; compare per-element against the modular path; report
where mismatches live (which centers/channels, hit counts)."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_sa_fused import modular, fused

B = 4
K = 32


def run(n, m, c, c2, radius, feat_scale=1.0, seed=0):
    cc1 = c
    keys = jax.random.split(jax.random.PRNGKey(seed + n + c), 10)
    pts = jax.random.normal(keys[0], (B, n, 3), jnp.float32) * 0.3
    ctr = pts[:, :m, :]
    feats = (jax.random.normal(keys[1], (B, n, c), jnp.float32)
             * feat_scale).astype(jnp.bfloat16)
    w1 = jax.random.normal(keys[2], (3 + c, cc1), jnp.float32) * 0.2
    b1 = jax.random.normal(keys[3], (cc1,), jnp.float32) * 0.1
    w2 = jax.random.normal(keys[4], (cc1, c2), jnp.float32) * 0.2
    b2 = jax.random.normal(keys[5], (c2,), jnp.float32) * 0.1
    ca1 = 1.0 + 0.1 * jax.random.normal(keys[6], (B, cc1))
    cb1 = 0.1 * jax.random.normal(keys[7], (B, cc1))
    ca2 = 1.0 + 0.1 * jax.random.normal(keys[8], (B, c2))
    cb2 = 0.1 * jax.random.normal(keys[9], (B, c2))
    args = (pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2)
    ref = jax.jit(functools.partial(modular, radius=radius))(*args)
    got = jax.jit(functools.partial(fused, radius=radius))(*args)
    diff = jnp.abs(ref - got)
    err = float(jnp.max(diff))
    # counts per center
    d2 = jnp.sum((ctr[:, :, None, :] - pts[:, None, :, :]) ** 2, -1)
    cnt = jnp.sum(d2 < radius ** 2, axis=2)           # (B, M)
    bi, mi, ci = jnp.unravel_index(jnp.argmax(diff), diff.shape)
    print(f"n={n} m={m} c={c} r={radius} fs={feat_scale}: "
          f"max|err|={err:.4f} at b={int(bi)} m={int(mi)} ch={int(ci)} "
          f"cnt={int(cnt[bi, mi])} ref={float(ref[bi, mi, ci]):.4f} "
          f"got={float(got[bi, mi, ci]):.4f}")
    bad = diff > 0.1
    nbad = int(jnp.sum(bad))
    if nbad:
        bad_any = jnp.any(bad, axis=2)                # (B, M)
        cnts_bad = cnt[bad_any]
        print(f"  bad elements: {nbad}  bad centers: "
              f"{int(jnp.sum(bad_any))}  their counts: "
              f"min={int(jnp.min(cnts_bad))} max={int(jnp.max(cnts_bad))} "
              f"num cnt==0: {int(jnp.sum(cnts_bad == 0))} "
              f"num cnt>={K}: {int(jnp.sum(cnts_bad >= K))}")


if __name__ == "__main__":
    run(2048, 1024, 32, 64, 0.1)
    run(2048, 1024, 32, 64, 0.4)
    run(2048, 1024, 32, 64, 0.1, feat_scale=0.01)
    run(1024, 256, 64, 128, 0.1)
    run(256, 256, 32, 64, 0.1)


def modular_f32(pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2,
                radius):
    from lion_tpu.ops.points import _ball_query_group_xla
    grouped = _ball_query_group_xla(pts, ctr, feats.astype(jnp.float32),
                                    radius, K, True)
    z1 = grouped @ w1 + b1
    h1 = gn8f(z1) * ca1[:, None, None, :] + cb1[:, None, None, :]
    h1 = h1 * jax.nn.sigmoid(h1)
    z2 = h1 @ w2 + b2
    h2 = gn8f(z2) * ca2[:, None, None, :] + cb2[:, None, None, :]
    h2 = h2 * jax.nn.sigmoid(h2)
    return jnp.max(h2, axis=2)


def gn8f(x, eps=1e-5):
    c = x.shape[-1]
    xs = x.reshape(x.shape[:-1] + (8, c // 8))
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.var(xs, axis=-1, keepdims=True)
    return ((xs - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)


def run_vs_f32(n, m, c, c2, radius, seed=0):
    cc1 = c
    keys = jax.random.split(jax.random.PRNGKey(seed + n + c), 10)
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
    args = (pts, ctr, feats, w1, b1, w2, b2, ca1, cb1, ca2, cb2)
    exact = jax.jit(functools.partial(modular_f32, radius=radius))(*args)
    ref = jax.jit(functools.partial(modular, radius=radius))(*args)
    got = jax.jit(functools.partial(fused, radius=radius))(*args)
    e_mod = jnp.abs(ref - exact)
    e_fus = jnp.abs(got - exact)
    print(f"n={n} m={m} c={c} r={radius}: vs fp32 -- "
          f"modular-bf16 max={float(jnp.max(e_mod)):.4f} "
          f"mean={float(jnp.mean(e_mod)):.5f} | fused "
          f"max={float(jnp.max(e_fus)):.4f} "
          f"mean={float(jnp.mean(e_fus)):.5f}")


if os.environ.get("VS32"):
    run_vs_f32(2048, 1024, 32, 64, 0.1)
    run_vs_f32(2048, 1024, 32, 64, 0.4)
    run_vs_f32(1024, 256, 64, 128, 0.2)
