"""Microbench: 9 small K=128 dots + fp32 acc adds (the _item_block_dots
pattern) vs ONE K=1152 dot over an explicitly built P operand.

    python scripts/exp_dot_chain.py
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

B = 16
R2 = 1024
NB = 16      # lane blocks
TAPS = 9

mm = functools.partial(jax.lax.dot_general,
                       dimension_numbers=(((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)


def kern_multi(x_ref, w_ref, o_ref):
    # x: (1, R2+2*32, NB*128) slab; w: (TAPS*128, 128)
    for gg in range(NB):
        lo = gg * 128
        acc = None
        for tap in range(TAPS):
            a = x_ref[0, tap * 32:tap * 32 + R2, lo:lo + 128]
            d = mm(a, w_ref[tap * 128:(tap + 1) * 128, :])
            acc = d if acc is None else acc + d
        o_ref[0, :, lo:lo + 128] = acc.astype(o_ref.dtype)


def kern_single(x_ref, w_ref, o_ref, p_buf):
    # build P (R2, TAPS*128) per block, one dot
    for gg in range(NB):
        lo = gg * 128
        for tap in range(TAPS):
            p_buf[:, tap * 128:(tap + 1) * 128] = \
                x_ref[0, tap * 32:tap * 32 + R2, lo:lo + 128]
        o_ref[0, :, lo:lo + 128] = mm(p_buf[...], w_ref[...]) \
            .astype(o_ref.dtype)


def run(kern, scratch):
    x = jnp.asarray(np.random.randn(B, R2 + 9 * 32, NB * 128), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(TAPS * 128, 128), jnp.bfloat16)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, R2, NB * 128), jnp.bfloat16),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R2 + 9 * 32, NB * 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TAPS * 128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R2, NB * 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20),
    )
    g = jax.jit(lambda x, w: f(x, w))
    float(g(x, w).sum())          # warm + sync
    iters = 30
    t0 = time.time()
    ys = [g(x, w) for _ in range(iters)]
    s = float(sum(y[0, 0, 0].astype(jnp.float32) for y in ys))  # drain
    dt = (time.time() - t0) / iters * 1e3
    macs = B * NB * R2 * TAPS * 128 * 128
    print(f"{dt:.3f} ms/call  ({macs / (dt * 1e-3) / 1e12:.1f} TMAC/s)")


if __name__ == "__main__":
    print("multi-dot acc: ", end="")
    run(kern_multi, [])
    print("single-dot P:  ", end="")
    run(kern_single, [pltpu.VMEM((R2, TAPS * 128), jnp.bfloat16)])
