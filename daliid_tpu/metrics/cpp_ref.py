"""ctypes loader (with on-demand g++ build) for the C++ ranking kernel.

The C++ kernel plays the role torchreid's Cython ``evaluate_cy`` plays for
the reference (``Person-ReID/validateModels.py:16-24``): a fast host-side
CMC/mAP scan used here as a parity oracle for the on-device XLA kernel.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_CPP_DIR = pathlib.Path(__file__).parent / "cpp"
_SRC = _CPP_DIR / "ranking.cpp"
_LIB = _CPP_DIR / "libranking.so"
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.evaluate_rank_market.restype = ctypes.c_int64
        lib.evaluate_rank_market.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return lib


def evaluate_rank_cpp(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """CMC curve + mAP via the C++ kernel. Same protocol/signature order as
    :func:`daliid_tpu.metrics.ranking.evaluate_rank_numpy`."""
    lib = _load()
    distmat = np.ascontiguousarray(distmat, dtype=np.float32)
    q_pids = np.ascontiguousarray(q_pids, dtype=np.int64)
    g_pids = np.ascontiguousarray(g_pids, dtype=np.int64)
    q_camids = np.ascontiguousarray(q_camids, dtype=np.int64)
    g_camids = np.ascontiguousarray(g_camids, dtype=np.int64)
    num_q, num_g = distmat.shape
    out_cmc = np.zeros(max_rank, dtype=np.float64)
    out_map = np.zeros(1, dtype=np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.evaluate_rank_market(
        ptr(distmat, ctypes.c_float),
        ptr(q_pids, ctypes.c_int64),
        ptr(q_camids, ctypes.c_int64),
        ptr(g_pids, ctypes.c_int64),
        ptr(g_camids, ctypes.c_int64),
        num_q,
        num_g,
        max_rank,
        ptr(out_cmc, ctypes.c_double),
        ptr(out_map, ctypes.c_double),
    )
    return out_cmc, float(out_map[0])
