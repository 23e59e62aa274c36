"""Parity tests for the packed-layout conv kernel (interpret mode).

conv3d_packed_fused must match swish(x*scale + bias) convolved with a
3x3x3 SAME conv (the reference Conv3d semantics, models/pvcnn2_ada.py:
195-280), including the per-channel (sum, sumsq) stats outputs, in the
packed (B, R^2, R*C) layout shared with voxelize/devoxelize.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lion_tpu.ops.pallas.conv3d_packed import (conv3d_packed_fused,
                                               supports_packed)


def _ref_conv(x5, w, sc, bi, pre_swish):
    xx = x5.astype(jnp.float32)
    if sc is not None:
        xx = xx * sc[:, None, None, None, :] + bi[:, None, None, None, :]
    if pre_swish:
        xx = xx * jax.nn.sigmoid(xx)
    y = lax.conv_general_dilated(
        xx, w.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y


@pytest.mark.parametrize("r,ci,co", [(16, 32, 32), (16, 64, 64),
                                     (16, 128, 128), (16, 8, 32),
                                     (32, 4, 32),
                                     (8, 32, 32), (8, 64, 64),
                                     (8, 128, 128)])
@pytest.mark.parametrize("affine", [True, False])
def test_packed_conv_parity(r, ci, co, affine):
    from lion_tpu.ops.pallas.conv3d_packed import supports_packed_small
    assert supports_packed(r, ci, co) or supports_packed_small(r, ci, co)
    b = 2
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(r * ci + co), 4)
    x5 = jax.random.normal(k0, (b, r, r, r, ci), jnp.float32)
    w = jax.random.normal(k1, (3, 3, 3, ci, co), jnp.float32) * 0.1
    sc = 1.0 + 0.1 * jax.random.normal(k2, (b, ci)) if affine else None
    bi = 0.1 * jax.random.normal(k3, (b, ci)) if affine else None

    xp = x5.reshape(b, r * r, r * ci)
    got_p, st = conv3d_packed_fused(
        xp, w, r, in_scale=sc, in_bias=bi, pre_swish=affine,
        want_stats=True, interpret=True)
    got = np.asarray(got_p, np.float32).reshape(b, r, r, r, co)

    want = np.asarray(_ref_conv(x5, w, sc, bi, affine))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    st_want = np.stack([want.sum(axis=(1, 2, 3)),
                        (want * want).sum(axis=(1, 2, 3))], axis=1)
    np.testing.assert_allclose(np.asarray(st), st_want,
                               rtol=5e-2, atol=5e-1)


def _fold_affine(st, b0, ca, cb, count, groups=8, eps=1e-5):
    """Per-item channel-affine GN fold (the pair kernel's in-kernel math,
    conv3d_packed.py _conv_kernel_pair; per-item `ca`/`cb` generalizes
    nn/common.gn_affine_from_stats)."""
    s1 = np.asarray(st[:, 0], np.float64) / count
    s2 = np.asarray(st[:, 1], np.float64) / count
    b0 = np.asarray(b0, np.float64)[None, :]
    mean_c = s1 + b0
    ex2_c = s2 + 2.0 * b0 * s1 + b0 * b0
    b, c = mean_c.shape
    cg = c // groups
    mu = mean_c.reshape(b, groups, cg).mean(2)
    gex2 = ex2_c.reshape(b, groups, cg).mean(2)
    rs = 1.0 / np.sqrt(np.maximum(gex2 - mu * mu, 0.0) + eps)
    rs_c = np.repeat(rs, cg, axis=1)
    mu_c = np.repeat(mu, cg, axis=1)
    sc = rs_c * np.asarray(ca, np.float64)
    bi = (b0 - mu_c) * sc + np.asarray(cb, np.float64)
    return sc.astype(np.float32), bi.astype(np.float32)


def test_packed_pair_parity():
    """conv3d_packed_pair (fused conv0 -> GN/AdaGN fold -> swish -> conv1)
    must match the two-call conv3d_packed_fused chain with the XLA fold
    between — the sampling path auto-dispatches the pair on TPU at
    r=32/C=64 (nn/pvconv.py), so its numerics need CPU coverage too."""
    from lion_tpu.ops.pallas.conv3d_packed import (conv3d_packed_pair,
                                                   supports_packed_pair)
    r, c, b = 32, 64, 1
    assert supports_packed_pair(r, c, c)
    k0, k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(7), 6)
    xp = jax.random.normal(k0, (b, r * r, r * c), jnp.float32)
    w0 = jax.random.normal(k1, (3, 3, 3, c, c), jnp.float32) * 0.1
    w1 = jax.random.normal(k2, (3, 3, 3, c, c), jnp.float32) * 0.1
    b0 = 0.1 * jax.random.normal(k3, (c,), jnp.float32)
    ca = 1.0 + 0.1 * jax.random.normal(k4, (b, c), jnp.float32)
    cb = 0.1 * jax.random.normal(k5, (b, c), jnp.float32)

    got, st = conv3d_packed_pair(xp, w0, b0, ca, cb, w1, r, interpret=True)

    y0, st0 = conv3d_packed_fused(xp, w0, r, want_stats=True,
                                  interpret=True)
    sc0, bi0 = _fold_affine(np.asarray(st0), b0, ca, cb, float(r) ** 3)
    want, st_want = conv3d_packed_fused(
        y0, w1, r, in_scale=jnp.asarray(sc0), in_bias=jnp.asarray(bi0),
        pre_swish=True, want_stats=True, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_want),
                               rtol=2e-3, atol=2e-1)


@pytest.mark.parametrize("r,c,n", [(32, 64, 2048), (8, 128, 256),
                                   (8, 128, 64)])
def test_pvblock_parity(r, c, n):
    """pvconv_block_pair (megafused voxelize -> conv pair -> devoxelize)
    must match the XLA voxelize + pair + XLA devoxelize chain — the
    sampling path auto-dispatches it on TPU at every _BLOCK_PAIR_WINS
    shape (nn/pvconv.py), so each needs CPU interpret-mode coverage.
    bf16-rounding differences from the in-kernel bf16 one-hot/tent dots
    bound the tolerance."""
    from lion_tpu.ops.pallas.pvblock import (pvconv_block_pair,
                                             supports_block_pair)
    from lion_tpu.ops.voxel import (_avg_voxelize_xla,
                                    _trilinear_devoxelize_xla,
                                    normalize_coords)
    b = 1
    if (r, c) == (32, 64):
        # r5: the binned vox/devox chain beats the megafused block at
        # (32, 64) (pvblock.py _BLOCK_PAIR_WINS) — off by default, still
        # reachable via LION_MEGAFUSE_3264=1, so keep kernel coverage
        assert not supports_block_pair(r, c, c, n)
    else:
        assert supports_block_pair(r, c, c, n)
    ks = jax.random.split(jax.random.PRNGKey(9), 7)
    feats = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    xyz = jax.random.normal(ks[1], (b, n, 3), jnp.float32) * 0.3
    w0 = jax.random.normal(ks[2], (3, 3, 3, c, c), jnp.float32) * 0.05
    w1 = jax.random.normal(ks[3], (3, 3, 3, c, c), jnp.float32) * 0.05
    b0 = 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
    ca = 1.0 + 0.1 * jax.random.normal(ks[5], (b, c), jnp.float32)
    cb = 0.1 * jax.random.normal(ks[6], (b, c), jnp.float32)

    norm_coords = normalize_coords(xyz, r)
    vox_c = jnp.round(norm_coords).astype(jnp.int32)

    got_pts, got_st = pvconv_block_pair(feats, vox_c, norm_coords, w0, b0,
                                        ca, cb, w1, r, interpret=True)

    grid = _avg_voxelize_xla(feats, vox_c, r)
    xp = grid.reshape(b, r * r, r * c)
    y1, st = conv3d_packed_fused(xp, w0, r, want_stats=True, interpret=True)
    sc0, bi0 = _fold_affine(np.asarray(st), b0, ca, cb, float(r) ** 3)
    y1, st1 = conv3d_packed_fused(
        y1, w1, r, in_scale=jnp.asarray(sc0), in_bias=jnp.asarray(bi0),
        pre_swish=True, want_stats=True, interpret=True)
    want_pts = _trilinear_devoxelize_xla(
        y1.reshape(b, r, r, r, c), norm_coords, r)

    a, w = np.asarray(got_pts, np.float32), np.asarray(want_pts, np.float32)
    scale = np.abs(w).max()
    np.testing.assert_allclose(a, w, atol=2e-2 * scale, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(st1),
                               rtol=2e-2, atol=2e-1)


def test_packed_layout_roundtrip():
    """(B,R,R,R,C) row-major == (B, R^2, R*C): the layout contract with
    voxelize (ops/pallas/voxelize.py) and devoxelize."""
    r, c = 8, 4
    x = np.arange(2 * r * r * r * c, dtype=np.float32).reshape(
        2, r, r, r, c)
    xp = x.reshape(2, r * r, r * c)
    assert (xp.reshape(2, r, r, r, c) == x).all()
