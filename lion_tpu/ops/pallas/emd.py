"""Pallas TPU kernel for the approximate-EMD auction (cost only).

The XLA form (ops/emd.py) materializes k = exp(level*d2) and the running
match as (B, N, M) HBM arrays every one of the 10 rounds — ~5.8 ms/pair
at N = M = 2048, and 98% of chair-scale eval wall-clock (2556 s of 2609,
VERDICT r4 weak #3). The metric path only consumes the scalar COST
sum(match * d2), so this kernel keeps the whole auction resident in VMEM:

  d2   (N, M) built once per item as one MXU dot (|x|^2 + |y|^2 - 2 x y^T)
  per round: k = exp(level * d2)                       (VPU, in VMEM)
             suml = k @ remain_r        (lane reduction, (N, 1))
             sumr = ratio_l^T @ k       (sublane reduction, (1, M))
             cost += sum(k * d2 * ratio_l * ratio_r)   (fused, no match)
  remain_l / remain_r live as (1, N) / (1, M) rows.

Reference semantics preserved exactly (third_party/PyTorchEMD/cuda/
emd_kernel.cu:24-157 `approxmatch` + :199-243 `matchcost`, python wrapper
emd.py:46-51 divides by N): the identical 10-level schedule
[-(4^j) for j in 7..-1] + [0] as ops/emd.py; same 1e-9 guards,
same clamp order. Cost-only: gradients do NOT flow (the caller
stop-gradients; eval metrics never differentiate EMD). The differentiable
path stays ops/emd.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEVELS = tuple([-float(4.0 ** j) for j in range(7, -2, -1)] + [0.0])


def _emd_kernel(n, m, multi_l, multi_r, x_ref, y_ref, out_ref):
    # x_ref (1, 8, N) fp32 rows [x, y, z, |p|^2, 0...]; y_ref (1, 8, M)
    # out_ref (1, 1) cost
    f32 = jnp.float32
    xt = x_ref[0]                                     # (8, N)
    yt = y_ref[0]                                     # (8, M)
    # d2[n, m] = |x_n|^2 + |y_m|^2 - 2 x_n . y_m via one K=8 MXU dot:
    # lhs rows: [2x 2y 2z |x|^2 1 0 0 0]^T per point n -> already packed so
    # that lhs @ rhs with rhs rows [-ym; 1; |y|^2] gives d2 directly.
    # hi/lo split: the raw bf16 MXU pass costs ~0.6% on the final cost
    # (exp(level*d2) at |level| up to 16384 amplifies operand rounding);
    # three K=8 dots recover fp32-level d2 for negligible time.
    mm = functools.partial(lax.dot_general,
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=f32)
    xh = xt.astype(jnp.bfloat16)
    xl = (xt - xh.astype(f32)).astype(jnp.bfloat16)
    yh = yt.astype(jnp.bfloat16)
    yl = (yt - yh.astype(f32)).astype(jnp.bfloat16)
    d2 = mm(xh, yh) + (mm(xh, yl) + mm(xl, yh))       # (N, M)
    remain_l = jnp.full((1, n), multi_l, f32)
    remain_r = jnp.full((1, m), multi_r, f32)
    cost = jnp.zeros((1, 1), f32)
    for level in _LEVELS:
        k = jnp.exp(f32(level) * d2) if level != 0.0 else \
            jnp.ones_like(d2)
        krr = k * remain_r                            # (N, M)
        suml = 1e-9 + jnp.sum(krr, axis=1, keepdims=True)       # (N, 1)
        ratio_l = remain_l.reshape(n, 1) / suml                 # (N, 1)
        sumr = jnp.sum(k * ratio_l, axis=0, keepdims=True) \
            * remain_r                                          # (1, M)
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        w = k * ratio_l * ratio_r                      # (N, M)
        cost = cost + jnp.sum(w * d2).reshape(1, 1)
        remain_l = jnp.maximum(
            0.0, remain_l - jnp.sum(w, axis=1).reshape(1, n))
    # full (8, 128) tile: Mosaic rejects sub-(8, 128) output blocks that
    # don't span the array (caught on-chip in round 5 — the interpret-mode
    # parity test can't see block-shape constraints)
    out_ref[0] = jnp.broadcast_to(cost, (8, 128))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _emd_cost_pallas(xp, yp, n, m, interpret=False):
    b = xp.shape[0]
    multi_l = 1.0 if n >= m else float(m // n)
    multi_r = float(n // m) if n >= m else 1.0
    out = pl.pallas_call(
        functools.partial(_emd_kernel, n, m, multi_l, multi_r),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(xp, yp)
    return out[:, 0, 0]


def emd_cost_supported(n: int, m: int) -> bool:
    """N, M lane-aligned and the (N, M) fp32 working set fits VMEM."""
    return (n % 128 == 0 and m % 128 == 0
            and n * m * 4 * 3 <= 90 * 2 ** 20)


def emd_approx_pallas(sample: jnp.ndarray, ref: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """sample (B, N, 3), ref (B, M, 3) -> cost (B,), divided by N.

    Non-differentiable fast path (metrics). Packs each cloud as 8 rows so
    d2 falls out of a single K=8 MXU contraction:
      lhs rows: [-2x, -2y, -2z, |p|^2-part..]; see below.
    """
    sample = lax.stop_gradient(sample).astype(jnp.float32)
    ref = lax.stop_gradient(ref).astype(jnp.float32)
    b, n, _ = sample.shape
    m = ref.shape[1]
    # rows such that lhs^T @ rhs = |x|^2 + |y|^2 - 2 x.y:
    #   x rows: [x0 x1 x2 |x|^2 1 0 0 0]
    #   y rows: [-2 y0, -2 y1, -2 y2, 1, |y|^2, 0 0 0]
    x2 = jnp.sum(sample * sample, axis=2)             # (B, N)
    y2 = jnp.sum(ref * ref, axis=2)                   # (B, M)
    zeros_n = jnp.zeros((b, 3, n), jnp.float32)
    zeros_m = jnp.zeros((b, 3, m), jnp.float32)
    xp = jnp.concatenate([
        jnp.transpose(sample, (0, 2, 1)),             # x rows (B, 3, N)
        x2[:, None, :], jnp.ones((b, 1, n), jnp.float32), zeros_n], axis=1)
    yp = jnp.concatenate([
        -2.0 * jnp.transpose(ref, (0, 2, 1)),
        jnp.ones((b, 1, m), jnp.float32), y2[:, None, :], zeros_m], axis=1)
    cost = _emd_cost_pallas(xp, yp, n, m, interpret)
    return cost / float(n)
