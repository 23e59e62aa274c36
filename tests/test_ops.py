"""Parity tests: every op vs a dense pure-numpy reference implementation.

This mirrors the reference test pattern (CUDA kernel vs pure-python impl,
third_party/ChamferDistancePytorch/unit_test.py) with the exact semantics of
the CUDA kernels documented in SURVEY.md section 2.8.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lion_tpu import ops


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


# ---------------------------------------------------------------- FPS
def fps_numpy(coords, num_samples):
    """Dense reference: sampling.cu semantics (seed idx 0, argmax min-dist)."""
    b, n, _ = coords.shape
    out = np.zeros((b, num_samples), np.int32)
    for bi in range(b):
        dist = np.full(n, np.inf)
        last = 0
        for j in range(1, num_samples):
            d = np.sum((coords[bi] - coords[bi, last]) ** 2, -1)
            dist = np.minimum(dist, d)
            last = int(np.argmax(dist))
            out[bi, j] = last
    return out


def test_fps_matches_reference():
    coords = _rand(2, 64, 3)
    got = np.asarray(ops.furthest_point_sample_idx(jnp.asarray(coords), 16))
    want = fps_numpy(coords, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_first_index_is_zero():
    coords = _rand(3, 32, 3, seed=1)
    idx = np.asarray(ops.furthest_point_sample_idx(jnp.asarray(coords), 8))
    assert (idx[:, 0] == 0).all()


def test_fps_centers_gather():
    coords = _rand(2, 64, 3, seed=2)
    centers = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 16))
    idx = fps_numpy(coords, 16)
    want = np.stack([coords[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(centers, want, rtol=1e-6)


# ---------------------------------------------------------------- ball query
def ball_query_numpy(centers, points, radius, k):
    """Dense reference: ball_query.cu:19-50 pad semantics."""
    b, m, _ = centers.shape
    n = points.shape[1]
    out = np.zeros((b, m, k), np.int32)
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for p in range(n):
                d2 = np.sum((centers[bi, j] - points[bi, p]) ** 2)
                if d2 < radius ** 2:
                    if cnt == 0:
                        out[bi, j, :] = p
                    out[bi, j, cnt] = p
                    cnt += 1
                    if cnt == k:
                        break
    return out


@pytest.mark.parametrize("radius,k", [(0.5, 4), (1.0, 8), (0.1, 4)])
def test_ball_query_matches_reference(radius, k):
    points = _rand(2, 48, 3, seed=3, scale=0.5)
    centers = points[:, :12]
    got = np.asarray(ops.ball_query(jnp.asarray(centers),
                                    jnp.asarray(points), radius, k))
    want = ball_query_numpy(centers, points, radius, k)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_gives_zero():
    points = np.ones((1, 8, 3), np.float32)
    centers = -np.ones((1, 2, 3), np.float32) * 10
    got = np.asarray(ops.ball_query(jnp.asarray(centers),
                                    jnp.asarray(points), 0.1, 4))
    assert (got == 0).all()


# ---------------------------------------------------------------- grouping
def test_grouping_gather():
    feats = _rand(2, 20, 5, seed=4)
    idx = np.random.RandomState(5).randint(0, 20, size=(2, 6, 3)).astype(np.int32)
    got = np.asarray(ops.grouping(jnp.asarray(feats), jnp.asarray(idx)))
    for bi in range(2):
        for m in range(6):
            for k in range(3):
                np.testing.assert_allclose(got[bi, m, k],
                                           feats[bi, idx[bi, m, k]])


# ---------------------------------------------------------------- voxelize
def avg_voxelize_numpy(features, vox_coords, r):
    b, n, c = features.shape
    out = np.zeros((b, r, r, r, c), np.float32)
    cnt = np.zeros((b, r, r, r), np.int64)
    for bi in range(b):
        for i in range(n):
            x, y, z = vox_coords[bi, i]
            out[bi, x, y, z] += features[bi, i]
            cnt[bi, x, y, z] += 1
    return out / np.maximum(cnt, 1)[..., None]


def test_avg_voxelize_matches_reference():
    r = 4
    feats = _rand(2, 32, 6, seed=6)
    vox = np.random.RandomState(7).randint(0, r, size=(2, 32, 3)).astype(np.int32)
    got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox), r))
    want = avg_voxelize_numpy(feats, vox, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_normalize_coords_range():
    coords = _rand(2, 32, 3, seed=8, scale=3.0)
    r = 8
    norm = np.asarray(ops.normalize_coords(jnp.asarray(coords), r))
    assert norm.min() >= 0.0 and norm.max() <= r - 1
    # torch-parity check of the formula itself
    centered = coords - coords.mean(1, keepdims=True)
    denom = np.linalg.norm(centered, axis=-1).max(1)[:, None, None] * 2.0
    want = np.clip((centered / denom + 0.5) * r, 0, r - 1)
    np.testing.assert_allclose(norm, want, rtol=1e-5, atol=1e-5)


def test_trilinear_devoxelize_roundtrip():
    """Constant grid -> devoxelize returns the constant at any coord."""
    r = 4
    grid = np.ones((1, r, r, r, 2), np.float32) * 3.0
    coords = np.random.RandomState(9).uniform(0, r - 1, (1, 16, 3)).astype(np.float32)
    out = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                              jnp.asarray(coords), r))
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)


def trilinear_numpy(grid, coords, r):
    b, n, _ = coords.shape
    c = grid.shape[-1]
    out = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        for i in range(n):
            x, y, z = coords[bi, i]
            lo = np.floor([x, y, z]).astype(int)
            fr = np.array([x, y, z]) - lo
            hi = lo + (fr > 0)
            for dx, wx in ((0, 1 - fr[0]), (1, fr[0])):
                for dy, wy in ((0, 1 - fr[1]), (1, fr[1])):
                    for dz, wz in ((0, 1 - fr[2]), (1, fr[2])):
                        ix = hi[0] if dx else lo[0]
                        iy = hi[1] if dy else lo[1]
                        iz = hi[2] if dz else lo[2]
                        out[bi, i] += wx * wy * wz * grid[bi, ix, iy, iz]
    return out


def test_trilinear_devoxelize_matches_reference():
    r = 4
    grid = _rand(2, r, r, r, 3, seed=10)
    coords = np.random.RandomState(11).uniform(0, r - 1, (2, 24, 3)).astype(np.float32)
    got = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                              jnp.asarray(coords), r))
    want = trilinear_numpy(grid, coords, r)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- 3-NN interp
def three_interp_numpy(points, centers, feats):
    b, n, _ = points.shape
    out = np.zeros((b, n, feats.shape[-1]), np.float32)
    for bi in range(b):
        for i in range(n):
            d2 = np.sum((centers[bi] - points[bi, i]) ** 2, -1)
            idx = np.argsort(d2, kind="stable")[:3]
            d = np.clip(d2[idx], 1e-10, 1e10)
            prods = np.array([d[1] * d[2], d[0] * d[2], d[0] * d[1]])
            w = prods / prods.sum()
            out[bi, i] = (feats[bi, idx] * w[:, None]).sum(0)
    return out


def test_nearest_neighbor_interpolate_matches_reference():
    points = _rand(2, 24, 3, seed=12)
    centers = _rand(2, 8, 3, seed=13)
    feats = _rand(2, 8, 5, seed=14)
    got = np.asarray(ops.nearest_neighbor_interpolate(
        jnp.asarray(points), jnp.asarray(centers), jnp.asarray(feats)))
    want = three_interp_numpy(points, centers, feats)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- chamfer
def test_chamfer_matches_bruteforce():
    a, b = _rand(2, 16, 3, seed=15), _rand(2, 24, 3, seed=16)
    da, db, ia, ib = ops.chamfer(jnp.asarray(a), jnp.asarray(b))
    d2 = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(np.asarray(da), d2.min(-1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(db), d2.min(-2), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ia), d2.argmin(-1))
    np.testing.assert_array_equal(np.asarray(ib), d2.argmin(-2))


def test_chamfer_zero_for_identical():
    a = _rand(1, 32, 3, seed=17)
    da, db, _, _ = ops.chamfer(jnp.asarray(a), jnp.asarray(a))
    assert float(jnp.max(da)) < 1e-5 and float(jnp.max(db)) < 1e-5


# ---------------------------------------------------------------- EMD
def test_emd_zero_for_identical():
    a = _rand(1, 64, 3, seed=18, scale=0.3)
    cost = float(ops.emd_approx(jnp.asarray(a), jnp.asarray(a))[0])
    assert cost < 1e-3, cost


def approx_match_numpy(d2):
    """Dense single-batch reference of emd_kernel.cu `approxmatch` (10-round
    multi-scale soft matching), used for parity with the jnp version."""
    n, m = d2.shape
    multi_l = 1.0 if n >= m else float(m // n)
    multi_r = float(n // m) if n >= m else 1.0
    remain_l = np.full(n, multi_l, np.float64)
    remain_r = np.full(m, multi_r, np.float64)
    match = np.zeros((n, m), np.float64)
    levels = [-(4.0 ** j) for j in range(7, -2, -1)] + [0.0]
    for level in levels:
        k = np.exp(level * d2)
        suml = 1e-9 + k @ remain_r
        ratio_l = remain_l / suml
        sumr = (k.T @ ratio_l) * remain_r
        ratio_r = np.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = np.maximum(0.0, remain_r - sumr)
        w = k * ratio_l[:, None] * ratio_r[None, :]
        match += w
        remain_l = np.maximum(0.0, remain_l - w.sum(1))
    return match


def test_emd_matches_numpy_reference():
    """jnp approxmatch == dense numpy approxmatch (same alg, same rounds)."""
    a = _rand(2, 32, 3, seed=19, scale=0.3)
    b = a + 0.1
    cost = np.asarray(ops.emd_approx(jnp.asarray(a), jnp.asarray(b)))
    assert (cost > 0).all()
    for bi in range(2):
        d2 = np.sum((a[bi, :, None] - b[bi, None]) ** 2, -1)
        match = approx_match_numpy(d2)
        want = (match * d2).sum() / 32
        np.testing.assert_allclose(cost[bi], want, rtol=1e-3)


def test_emd_match_marginals():
    """approxmatch marginals: rows/cols of match sum to ~1 when n == m."""
    from lion_tpu.ops.emd import _approx_match
    from lion_tpu.ops.points import pairwise_sqdist
    a = _rand(1, 24, 3, seed=22, scale=0.4)
    b = _rand(1, 24, 3, seed=23, scale=0.4)
    d2 = pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    match = np.asarray(_approx_match(d2, 24, 24))
    np.testing.assert_allclose(match.sum(2), 1.0, atol=0.05)
    np.testing.assert_allclose(match.sum(1), 1.0, atol=0.05)


def test_emd_pallas_cost_matches_dense():
    """The VMEM-resident Pallas auction (ops/pallas/emd.py, cost-only eval
    path) == the XLA form, interpret mode (lane-aligned N=M=128 so the
    TPU layout constraints are exercised)."""
    from lion_tpu.ops.pallas.emd import emd_approx_pallas, emd_cost_supported
    assert emd_cost_supported(2048, 2048)
    assert not emd_cost_supported(2000, 2048)   # lane alignment
    assert not emd_cost_supported(8192, 8192)   # VMEM fit
    a = jnp.asarray(_rand(3, 128, 3, seed=24, scale=0.4))
    b = jnp.asarray(_rand(3, 128, 3, seed=25, scale=0.4))
    want = np.asarray(ops.emd_approx(a, b))
    got = np.asarray(emd_approx_pallas(a, b, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
    # permuted-copy sanity through the packed-d2 path
    perm = np.random.RandomState(9).permutation(128)
    got0 = float(emd_approx_pallas(a, a[:, perm], interpret=True)[0])
    assert got0 < 1e-3, got0


def test_emd_matches_assignment_on_permutation():
    """EMD of a permuted copy should be ~0 (perfect matching exists)."""
    rng = np.random.RandomState(20)
    a = _rand(1, 32, 3, seed=21, scale=0.4)
    perm = rng.permutation(32)
    b = a[:, perm]
    cost = float(ops.emd_approx(jnp.asarray(a), jnp.asarray(b))[0])
    assert cost < 1e-3, cost
