"""Compare conv3d strategies at the local-prior hot shapes on real TPU.

Each variant runs 20x inside one lax.scan (amortizes dispatch): reports
device ms per conv.

Variants:
  direct   — lax.conv_general_dilated NDHWC (what the model uses today)
  patches  — conv_general_dilated_patches -> one big dot (im2col via XLA)
  kdpack   — 2D 9-tap patches per z-plane, one matmul to 3*Cout columns,
             shifted adds over kd (the formulation planned for Pallas)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
R = 32
ITERS = 20


def direct(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def patches(x, w):
    c_in = x.shape[-1]
    c_out = w.shape[-1]
    p = lax.conv_general_dilated_patches(
        x, (3, 3, 3), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # p: (B, D, H, W, C*27) with feature-major ordering (c, kd, kh, kw)
    wf = w.transpose(3, 0, 1, 2, 4).reshape(c_in * 27, c_out)
    out = jnp.einsum("bdhwk,ko->bdhwo", p, wf,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16)


def kdpack(x, w):
    b, d, h, ww, c_in = x.shape
    c_out = w.shape[-1]
    # pad z only; 2D patches handle h/w SAME padding
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    planes = xp.reshape(b * (d + 2), h, ww, c_in)
    p2 = lax.conv_general_dilated_patches(
        planes, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B*, H, W, C*9)
    # weights: (kd, kh, kw, ci, co) -> (ci*kh*kw, kd*co) to match
    # patches' (c, kh, kw) feature-major layout
    w2 = w.transpose(3, 1, 2, 0, 4).reshape(c_in * 9, 3 * c_out)
    a = jnp.einsum("phwk,km->phwm", p2, w2,
                   preferred_element_type=jnp.float32)
    a = a.reshape(b, d + 2, h, ww, 3, c_out)
    out = a[:, :-2, :, :, 2] + a[:, 1:-1, :, :, 1] + a[:, 2:, :, :, 0]
    return out.astype(jnp.bfloat16)


def bench(name, fn, c_in, c_out):
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (B, R, R, R, c_in)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1),
                           (3, 3, 3, c_in, c_out)) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(carry, _):
            y = fn(carry, w)
            # feed a cheap transform back so scan can't hoist the conv
            return (y * 0.999).astype(jnp.bfloat16)[..., :c_in], None
        if c_out != c_in:
            def body(carry, _):  # noqa: F811
                y = fn(carry, w)
                return jnp.repeat(y[..., :1], c_in, -1) * 0.01, None
        out, _ = lax.scan(body, x, None, length=ITERS)
        return out

    r = run(x, w)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = run(x, w)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    gflop = B * R ** 3 * 27 * c_in * c_out * 2 / 1e9
    print(f"{name:8s} c{c_in:3d}->{c_out:3d}: {dt:7.3f} ms/conv "
          f"({gflop / dt:6.1f} TF/s eff)")
    return dt


for c in (32, 64):
    for name, fn in (("direct", direct), ("patches", patches),
                     ("kdpack", kdpack)):
        try:
            bench(name, fn, c, c)
        except Exception as e:
            print(f"{name} c{c}: FAILED {type(e).__name__}: {e}")
