"""TPU parity + timing for conv3d_packed_pair vs the two-call chain
(conv3d_packed_fused x2 + XLA GN fold) at the sampling-step hot shapes."""
import glob
import gzip
import json
import os
import sys
import time

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


def timed(fn, *args):
    out = fn(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in
                  jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(sum(jnp.sum(o.astype(jnp.float32)) for o in
                  jax.tree_util.tree_leaves(out)))
    return (time.perf_counter() - t0) / N_CALLS * 1e6


def main():
    from lion_tpu.ops.pallas.conv3d_packed import (
        conv3d_packed_fused, conv3d_packed_pair, supports_packed_pair)
    from lion_tpu.nn.common import gn_affine_from_stats

    rng = np.random.RandomState(0)
    for r, ci in [(32, 32), (32, 64), (16, 64), (16, 128)]:
        if not supports_packed_pair(r, ci, ci):
            print(f"r={r} c={ci}: pair unsupported "
                  f"(vmem estimate over budget)")
            continue
        rc = r * ci
        xp = jnp.asarray(rng.randn(B, r * r, rc), jnp.float32) \
                .astype(jnp.bfloat16)
        w0 = jnp.asarray(rng.randn(3, 3, 3, ci, ci) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.randn(3, 3, 3, ci, ci) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.randn(ci) * 0.1, jnp.float32)
        ca = jnp.asarray(1 + rng.randn(B, ci) * 0.1, jnp.float32)
        cb = jnp.asarray(rng.randn(B, ci) * 0.1, jnp.float32)
        w0b, w1b = w0.astype(jnp.bfloat16), w1.astype(jnp.bfloat16)

        @jax.jit
        def chain(xp, w0b, w1b, b0, ca, cb):
            outs = []
            for i in range(N_CALLS):
                y0, st0 = conv3d_packed_fused(xp, w0b, r, want_stats=True)
                sg, bg = gn_affine_from_stats(
                    st0[:, 0], st0[:, 1], float(r ** 3),
                    jnp.ones(ci), jnp.zeros(ci), pre_bias=b0)
                y1, st1 = conv3d_packed_fused(
                    y0, w1b, r, in_scale=sg * ca, in_bias=bg * ca + cb,
                    pre_swish=True, want_stats=True)
                outs.append(y1[0, 0, :1])
            return jnp.concatenate(outs), y1, st1

        @jax.jit
        def pair(xp, w0b, w1b, b0, ca, cb):
            outs = []
            for i in range(N_CALLS):
                y1, st1 = conv3d_packed_pair(xp, w0b, b0, ca, cb, w1b, r)
                outs.append(y1[0, 0, :1])
            return jnp.concatenate(outs), y1, st1

        _, y1c, st1c = chain(xp, w0b, w1b, b0, ca, cb)
        _, y1p, st1p = pair(xp, w0b, w1b, b0, ca, cb)
        d = float(jnp.max(jnp.abs(y1c.astype(jnp.float32)
                                  - y1p.astype(jnp.float32))))
        sref = float(jnp.max(jnp.abs(st1c)))
        ds = float(jnp.max(jnp.abs(st1c - st1p))) / (sref + 1e-9)
        tc = timed(chain, xp, w0b, w1b, b0, ca, cb)
        tp = timed(pair, xp, w0b, w1b, b0, ca, cb)
        print(f"r={r} c={ci}: chain {tc:7.1f} us  pair {tp:7.1f} us "
              f"({tc / tp:.2f}x)  maxdiff={d:.5f} strel={ds:.6f}")


if __name__ == "__main__":
    main()
