"""Metric suite tests: known-answer checks on constructed distributions."""
import numpy as np
import pytest

from lion_tpu.eval import (compute_all_metrics, emd_cd_paired,
                           jsd_between_point_cloud_sets, knn_accuracy,
                           lgan_mmd_cov, normalize_point_clouds, pairwise_cd,
                           pairwise_emd)


def _clouds(n_clouds, n_pts=64, seed=0, shift=0.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n_clouds, n_pts, 3) * 0.2 + shift).astype(np.float32)


def test_pairwise_cd_diagonal_zero():
    pcs = _clouds(6)
    m = pairwise_cd(pcs, pcs, block_s=4, block_r=4)
    assert m.shape == (6, 6)
    assert np.abs(np.diag(m)).max() < 1e-5
    assert (m + 1e-6 >= 0).all()
    np.testing.assert_allclose(m, m.T, rtol=1e-3, atol=1e-5)


def test_pairwise_cd_matches_bruteforce():
    a, b = _clouds(3, seed=1), _clouds(5, seed=2)
    m = pairwise_cd(a, b, block_s=2, block_r=3)
    for i in range(3):
        for j in range(5):
            d2 = ((a[i][:, None] - b[j][None]) ** 2).sum(-1)
            want = d2.min(1).mean() + d2.min(0).mean()
            np.testing.assert_allclose(m[i, j], want, rtol=1e-4, atol=1e-5)


def test_pairwise_emd_diagonal_near_zero():
    pcs = _clouds(4, n_pts=32)
    m = pairwise_emd(pcs, pcs, block_s=2, block_r=2)
    assert np.abs(np.diag(m)).max() < 1e-3
    assert m.shape == (4, 4)


def test_lgan_mmd_cov():
    # 3 samples, 4 refs; sample i matches ref i exactly
    d = np.full((3, 4), 10.0)
    for i in range(3):
        d[i, i] = 0.1
    res = lgan_mmd_cov(d)
    assert res["lgan_cov"] == 3 / 4
    np.testing.assert_allclose(res["lgan_mmd"], (0.1 * 3 + 10) / 4)


def test_knn_accuracy_separable():
    """Two well-separated sets -> 1-NNA accuracy ~ 1.0."""
    a = _clouds(8, seed=3, shift=0.0)
    b = _clouds(8, seed=4, shift=5.0)
    mxx = pairwise_cd(a, a, 4, 4)
    mxy = pairwise_cd(a, b, 4, 4)
    myy = pairwise_cd(b, b, 4, 4)
    res = knn_accuracy(mxx, mxy, myy, k=1)
    assert res["acc"] == 1.0


def test_knn_accuracy_identical_distribution():
    """Same distribution -> accuracy near 0.5 (the ideal)."""
    rng = np.random.RandomState(5)
    pcs = _clouds(40, seed=5)
    mxx = pairwise_cd(pcs[:20], pcs[:20], 4, 4)
    mxy = pairwise_cd(pcs[:20], pcs[20:], 4, 4)
    myy = pairwise_cd(pcs[20:], pcs[20:], 4, 4)
    res = knn_accuracy(mxx, mxy, myy, k=1)
    assert 0.25 <= res["acc"] <= 0.75


def test_compute_all_metrics_keys():
    a, b = _clouds(6, n_pts=32, seed=6), _clouds(6, n_pts=32, seed=7)
    res = compute_all_metrics(a, b)
    for key in ["lgan_mmd-CD", "lgan_cov-CD", "1-NN-CD-acc",
                "lgan_mmd-EMD", "lgan_cov-EMD", "1-NN-EMD-acc"]:
        assert key in res, res.keys()
        assert np.isfinite(res[key])


def test_emd_cd_paired():
    a = _clouds(6, n_pts=32, seed=8)
    res = emd_cd_paired(a, a, batch_size=3)
    assert res["MMD-CD"] < 1e-5
    assert res["MMD-EMD"] < 1e-3


def test_jsd_identical_sets_near_zero():
    pcs = _clouds(10, seed=9) * 0.5  # keep inside unit sphere
    jsd = jsd_between_point_cloud_sets(pcs, pcs)
    assert jsd < 1e-6


def test_jsd_different_sets_positive():
    a = np.clip(_clouds(10, seed=10) * 0.3, -0.45, 0.45)
    b = np.clip(_clouds(10, seed=11) * 0.3 + 0.2, -0.45, 0.45)
    jsd = jsd_between_point_cloud_sets(a, b)
    assert jsd > 0.01


def test_normalize_point_clouds_bbox():
    pcs = _clouds(3, seed=12) * 4.0 + 2.0
    out = normalize_point_clouds(pcs)
    for pc in out:
        mx, mn = pc.max(0), pc.min(0)
        np.testing.assert_allclose((mx + mn) / 2, 0.0, atol=1e-5)
        assert abs((mx - mn).max() / 2 - 1.0) < 1e-5


def test_compute_score_end_to_end(tmp_path):
    """Full compute_score path: torch .pt files in, metrics + TSV out
    (reference eval_helper.py:217-340 orchestration)."""
    import torch
    from lion_tpu.eval import compute_score
    rng = np.random.RandomState(30)
    n_ref, n_pts = 6, 32
    ref = rng.randn(n_ref, n_pts, 3).astype(np.float32) * 0.2
    mean = rng.randn(n_ref, 1, 3).astype(np.float32) * 0.1
    std = np.abs(rng.randn(n_ref, 1, 1).astype(np.float32)) + 0.5
    gen = ref + rng.randn(*ref.shape).astype(np.float32) * 0.05
    ref_path = str(tmp_path / "ref.pt")
    gen_path = str(tmp_path / "samples.pt")
    torch.save({"ref": torch.from_numpy(ref), "mean": torch.from_numpy(mean),
                "std": torch.from_numpy(std)}, ref_path)
    torch.save(torch.from_numpy(gen), gen_path)

    results = compute_score(gen_path, ref_path, dataset="test",
                            results_dir=str(tmp_path / "results"))
    for key in ["lgan_mmd-CD", "lgan_cov-CD", "1-NN-CD-acc",
                "1-NN-EMD-acc", "jsd"]:
        assert key in results and np.isfinite(results[key]), key
    # near-identical sets: 1-NNA should be near chance, COV high
    assert results["lgan_cov-CD"] > 0.5
    csv = tmp_path / "results" / "eval_out.csv"
    assert csv.exists() and "1-NNA" in csv.read_text()
