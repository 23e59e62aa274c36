"""Pallas TPU kernel for furthest point sampling.

FPS is an inherently sequential argmax chain (reference CUDA:
third_party/pvcnn/functional/src/sampling/sampling.cu:86-167). The pure-XLA
fori_loop version dispatches ~M tiny ops per call; this kernel runs the
WHOLE chain on-chip with the BATCH laid out over sublanes: coords (3, B, N)
and the running min-distance (B, N) live in VMEM, and every iteration is
one fused VPU sweep over all batch rows simultaneously (distance + min +
per-row argmax). M iterations total -- independent of batch size (a
grid-over-batch variant serializes, since Pallas grid programs run
sequentially on a core).

The kernel also emits the PICKED COORDINATES (3, B, M): each pick step
already extracts the previous pick's (x, y, z) via masked maxes for the
distance update, so recording them into a lane-major slot buffer costs
three (B, M) masked rewrites per pick -- while the XLA alternative
(take_along_axis on the (B, N, 3) cloud) measured ~84 us at
B16/N2048/M1024 vs ~1 us for the (3, B, M) -> (B, M, 3) transpose
(round 5).

Semantics match the CUDA kernel: index 0 seeds the chain; ties resolve to
the lowest index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(coords_ref, out_ref, ctr_ref, min_d2, idx_buf, ctr_buf):
    # coords_ref: (3, B, N); out_ref: (B, M) int32; ctr_ref: (3, B, M) f32
    _, b, n = coords_ref.shape
    m = out_ref.shape[1]
    x = coords_ref[0]  # (B, N)
    y = coords_ref[1]
    z = coords_ref[2]

    min_d2[...] = jnp.full((b, n), jnp.inf, jnp.float32)
    idx_buf[...] = jnp.zeros((b, m), jnp.int32)  # slot 0 seeds index 0

    lane = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    slot = lax.broadcasted_iota(jnp.int32, (b, m), 1)
    slot3 = lax.broadcasted_iota(jnp.int32, (3 * b, m), 1)

    def pick(mind, last):
        # one FPS step: update running min-dist with the last pick,
        # argmax with lowest-index tie-break. (Measured r4: merging the
        # three coordinate extractions into one (3B, N) masked fold was
        # ~23% SLOWER; per-axis folds stay.) Returns the new min-dist,
        # the next pick, and the coords OF `last` (already extracted for
        # the distance update) stacked (3B, 1) for the slot buffer.
        sel = lane == last  # (B, N)
        cx = jnp.max(jnp.where(sel, x, -jnp.inf), axis=1, keepdims=True)
        cy = jnp.max(jnp.where(sel, y, -jnp.inf), axis=1, keepdims=True)
        cz = jnp.max(jnp.where(sel, z, -jnp.inf), axis=1, keepdims=True)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        new_min = jnp.minimum(mind, d2)
        best = jnp.max(new_min, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(new_min == best, lane, n), axis=1,
                      keepdims=True).astype(jnp.int32)  # (B, 1)
        cxyz = jnp.concatenate([cx, cy, cz], axis=0)    # (3B, 1)
        return new_min, nxt, cxyz

    # UNROLL u sequential picks per loop iteration: the chain is
    # inherently serial, but the per-iteration Mosaic loop overhead
    # (~0.2-0.3us) dominated the ~0.1us of VPU work (measured r4);
    # u picks per trip cut it u-fold. Index stores stay slot-masked
    # rewrites: Mosaic cannot prove dynamic lane offsets 128-aligned.
    u = 4
    chunks = (m - 1) // u

    def body(j, last):
        mind = min_d2[...]
        buf = idx_buf[...]
        cbuf = ctr_buf[...]
        for t in range(u):
            s = 1 + j * u + t
            mind, nxt, cxyz = pick(mind, last)
            buf = jnp.where(slot == s, nxt, buf)
            # pick() extracted the coords of `last` = pick s-1
            cbuf = jnp.where(slot3 == s - 1, cxyz, cbuf)
            last = nxt
        idx_buf[...] = buf
        min_d2[...] = mind
        ctr_buf[...] = cbuf
        return last

    last = lax.fori_loop(0, chunks, body,
                         jnp.zeros((b, 1), jnp.int32))
    mind = min_d2[...]
    buf = idx_buf[...]
    cbuf = ctr_buf[...]
    for t in range(1 + chunks * u, m):          # remainder picks
        s = t
        mind, nxt, cxyz = pick(mind, last)
        buf = jnp.where(slot == s, nxt, buf)
        cbuf = jnp.where(slot3 == s - 1, cxyz, cbuf)
        last = nxt
    # the final pick's coords were never extracted inside the loop
    _, _, cxyz = pick(mind, last)
    cbuf = jnp.where(slot3 == m - 1, cxyz, cbuf)
    out_ref[...] = buf
    ctr_ref[...] = cbuf.reshape(3, b, m)


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample_pallas(coords: jnp.ndarray, num_samples: int):
    """coords (B, N, 3) -> (idx (B, M) int32, centers_t (3, B, M) f32).

    TPU fast path; centers_t[..., s] are the exact fp32 coords of pick s
    (transpose to (B, M, 3) costs ~1 us in XLA)."""
    b, n, _ = coords.shape
    coords_t = jnp.transpose(coords, (2, 0, 1)).astype(jnp.float32)
    return pl.pallas_call(
        _fps_kernel,
        out_shape=[jax.ShapeDtypeStruct((b, num_samples), jnp.int32),
                   jax.ShapeDtypeStruct((3, b, num_samples), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32),
                        pltpu.VMEM((b, num_samples), jnp.int32),
                        pltpu.VMEM((3 * b, num_samples), jnp.float32)],
    )(coords_t)


@functools.partial(jax.jit, static_argnums=1)
def furthest_point_sample_idx_pallas(coords: jnp.ndarray,
                                     num_samples: int) -> jnp.ndarray:
    """coords (B, N, 3) -> (B, num_samples) int32. TPU fast path."""
    return furthest_point_sample_pallas(coords, num_samples)[0]
