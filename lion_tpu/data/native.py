"""ctypes binding for the native parallel .npy loader (csrc/npy_loader.cpp).

Builds the shared library lazily with g++ on first use; falls back to
single-threaded numpy loading if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = _repo_root()
    src = os.path.join(root, "csrc", "npy_loader.cpp")
    out = os.path.join(root, "csrc", "libnpyloader.so")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", out],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        lib = ctypes.CDLL(out)
        lib.npy_load_batch.restype = ctypes.c_int
        lib.npy_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int]
        lib.npy_probe.restype = ctypes.c_int
        lib.npy_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_longlong)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def load_npy_batch(paths: List[str], n_points: int, dims: int = 3,
                   n_threads: int = 0) -> np.ndarray:
    """Load len(paths) .npy clouds -> (len(paths), n_points, dims) fp32.

    Each file must hold at least n_points rows; extra rows are truncated
    (matching the reference's use of the first 15k/10k points).
    """
    lib = _build_and_load()
    n = len(paths)
    out = np.empty((n, n_points, dims), np.float32)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        rc = lib.npy_load_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_points, dims, n_threads)
        if rc == 0:
            return out
        # fall through to numpy on failure (bad file reported by index rc)
    for i, p in enumerate(paths):
        arr = np.load(p)
        out[i] = arr[:n_points, :dims].astype(np.float32)
    return out
