"""Native .npy loader: build, parity with numpy, threading, error paths."""
import numpy as np
import pytest

from lion_tpu.data.native import load_npy_batch, native_available


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i in range(8):
        arr = rng.randn(100, 3).astype(np.float32)
        p = root / f"f{i}.npy"
        np.save(str(p), arr)
        paths.append(str(p))
        arrays.append(arr)
    # one float64 file (must be converted)
    arr64 = rng.randn(100, 3)
    p64 = root / "f64.npy"
    np.save(str(p64), arr64)
    return paths, arrays, str(p64), arr64


def test_native_builds():
    assert native_available(), "g++ build of npy_loader failed"


def test_batch_matches_numpy(npy_files):
    paths, arrays, _, _ = npy_files
    out = load_npy_batch(paths, n_points=64, dims=3, n_threads=4)
    assert out.shape == (8, 64, 3)
    for i in range(8):
        np.testing.assert_array_equal(out[i], arrays[i][:64])


def test_float64_payload(npy_files):
    _, _, p64, arr64 = npy_files
    out = load_npy_batch([p64], n_points=50, dims=3)
    np.testing.assert_allclose(out[0], arr64[:50].astype(np.float32),
                               rtol=1e-6)


def test_missing_file_falls_back(tmp_path):
    arr = np.random.RandomState(1).randn(20, 3).astype(np.float32)
    good = tmp_path / "good.npy"
    np.save(str(good), arr)
    # nonexistent file: native reports failure; numpy fallback raises
    with pytest.raises(FileNotFoundError):
        load_npy_batch([str(good), str(tmp_path / "missing.npy")],
                       n_points=10)
