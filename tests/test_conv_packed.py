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
                                     (32, 4, 32)])
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


def test_packed_layout_roundtrip():
    """(B,R,R,R,C) row-major == (B, R^2, R*C): the layout contract with
    voxelize (ops/pallas/voxelize.py) and devoxelize."""
    r, c = 8, 4
    x = np.arange(2 * r * r * r * c, dtype=np.float32).reshape(
        2, r, r, r, c)
    xp = x.reshape(2, r * r, r * c)
    assert (xp.reshape(2, r, r, r, c) == x).all()
