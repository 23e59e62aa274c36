"""Decompose conv3d_packed_fused's time at (r=32, C=64): full kernel vs
dots-only (no slab fills) vs fills-only (no dots). Isolates whether the
gap vs the MXU bound is VPU fill serialization or dot-chain overhead.

    python scripts/exp_conv_anatomy.py
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
R2 = R * R
NG = R * CI // 128
KMAIN = 9 * 128
KEDGE = (18 * CI + 127) // 128 * 128

mm = functools.partial(jax.lax.dot_general,
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)


def kern(mode, x_ref, w_ref, out_ref, y_buf, ey_buf, p_buf):
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
    yq = rowi % R
    mask_lo = yq != 0
    mask_hi = yq != R - 1
    gi = pl.program_id(1)

    del gi
    v = x_ref[0, :, 0:128].reshape(R2, 128)  # fixed block read

    if mode in ("full", "fills"):
        y_buf[0, R:R + R2] = jnp.where(
            mask_lo, jnp.concatenate([v[R2 - 1:], v[:R2 - 1]], axis=0), 0)
        y_buf[1, R:R + R2] = v
        y_buf[2, R:R + R2] = jnp.where(
            mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)
        ev = x_ref[0, :, :2 * CI].reshape(R2, 2 * CI)
        ey_buf[0, R:R + R2] = jnp.where(
            mask_lo, jnp.concatenate([ev[R2 - 1:], ev[:R2 - 1]], axis=0), 0)
        ey_buf[1, R:R + R2] = ev
        ey_buf[2, R:R + R2] = jnp.where(
            mask_hi, jnp.concatenate([ev[1:], ev[:1]], axis=0), 0)
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            p_buf[:, tap * 2 * CI:(tap + 1) * 2 * CI] = \
                ey_buf[t1 + 1, R + t0 * R:R + t0 * R + R2]

    if mode in ("full", "dots"):
        yi = mm(p_buf[:, :KEDGE], w_ref[KMAIN:, :])
        for tap in range(9):
            t0, t1 = tap // 3 - 1, tap % 3 - 1
            yi += mm(y_buf[t1 + 1, R + t0 * R:R + t0 * R + R2],
                     w_ref[tap * 128:(tap + 1) * 128, :])
        out_ref[0, 0] = yi.astype(out_ref.dtype)
    else:
        out_ref[0, 0] = y_buf[1, R:R + R2].astype(out_ref.dtype)


def kern_tree(x_ref, w_ref, out_ref, y_buf, ey_buf, p_buf):
    """Same fills; dots accumulated as a PAIRWISE TREE instead of a
    serial += chain."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
    yq = rowi % R
    mask_lo = yq != 0
    mask_hi = yq != R - 1

    v = x_ref[0, :, 0:128].reshape(R2, 128)
    y_buf[0, R:R + R2] = jnp.where(
        mask_lo, jnp.concatenate([v[R2 - 1:], v[:R2 - 1]], axis=0), 0)
    y_buf[1, R:R + R2] = v
    y_buf[2, R:R + R2] = jnp.where(
        mask_hi, jnp.concatenate([v[1:], v[:1]], axis=0), 0)
    ev = x_ref[0, :, :2 * CI].reshape(R2, 2 * CI)
    ey_buf[0, R:R + R2] = jnp.where(
        mask_lo, jnp.concatenate([ev[R2 - 1:], ev[:R2 - 1]], axis=0), 0)
    ey_buf[1, R:R + R2] = ev
    ey_buf[2, R:R + R2] = jnp.where(
        mask_hi, jnp.concatenate([ev[1:], ev[:1]], axis=0), 0)
    for tap in range(9):
        t0, t1 = tap // 3 - 1, tap % 3 - 1
        p_buf[:, tap * 2 * CI:(tap + 1) * 2 * CI] = \
            ey_buf[t1 + 1, R + t0 * R:R + t0 * R + R2]

    ds = [mm(p_buf[:, :KEDGE], w_ref[KMAIN:, :])]
    for tap in range(9):
        t0, t1 = tap // 3 - 1, tap % 3 - 1
        ds.append(mm(y_buf[t1 + 1, R + t0 * R:R + t0 * R + R2],
                     w_ref[tap * 128:(tap + 1) * 128, :]))
    while len(ds) > 1:
        nxt = [ds[i] + ds[i + 1] for i in range(0, len(ds) - 1, 2)]
        if len(ds) % 2:
            nxt.append(ds[-1])
        ds = nxt
    out_ref[0, 0] = ds[0].astype(out_ref.dtype)


def run(label, kfn):
    x = jnp.asarray(np.random.randn(B, R2, R * CI), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(KMAIN + KEDGE, 128), jnp.bfloat16)
    f = pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((B, NG, R2, 128), jnp.bfloat16),
        grid=(B, NG),
        in_specs=[pl.BlockSpec((1, R2, R * CI), lambda i, g: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((KMAIN + KEDGE, 128), lambda i, g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, R2, 128), lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, R + R2 + R, 128), jnp.bfloat16),
            pltpu.VMEM((3, R + R2 + R, 2 * CI), jnp.bfloat16),
            pltpu.VMEM((R2, KEDGE), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20),
    )
    g = jax.jit(lambda x, w: f(x, w))
    float(g(x, w).sum())
    iters = 30
    t0 = time.time()
    ys = [g(x, w) for _ in range(iters)]
    float(sum(y[0, 0, 0, 0].astype(jnp.float32) for y in ys))
    dt = (time.time() - t0) / iters * 1e3
    macs = B * NG * R2 * (KMAIN + KEDGE) * 128
    print(f"{label}: {dt:.3f} ms/call ({macs / dt * 1e3 / 1e12:.1f} TMAC/s)")


if __name__ == "__main__":
    run("dots-only ", functools.partial(kern, "dots"))
    run("fills-only", functools.partial(kern, "fills"))
    run("full      ", functools.partial(kern, "full"))
    run("full-tree ", kern_tree)
