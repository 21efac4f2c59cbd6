"""ctypes wrapper for the native C++ JPEG ingest (decode + bicubic resize).

The C++ counterpart of the reference's 8-worker Python DataLoader decode
path (``Person-ReID/getFeatures.py:52``): libjpeg decode + scale-adaptive
Keys-bicubic resample on a std::thread pool, filling one preallocated uint8
HWC batch buffer with zero Python in the loop. Used as the fast ingest path
by :class:`daliid_tpu.eval.features.FeatureExtractor` when available; PIL
remains the fallback (and the parity oracle — outputs agree to ~1/255).
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import platform
import subprocess
import threading

import numpy as np

_CPP_DIR = pathlib.Path(__file__).parent / "cpp"
_SRC = _CPP_DIR / "loader.cpp"
_lock = threading.Lock()
_lib = None
_unavailable = False


def _host_tag() -> str:
    """Cache key for the compiled library: -march=native bakes this host's
    ISA into the binary, so a checkout carried to a different CPU must
    rebuild rather than SIGILL mid-decode."""
    try:
        flags = next(
            l for l in open("/proc/cpuinfo") if l.startswith(("flags", "Features"))
        )
    except (OSError, StopIteration):
        flags = platform.processor() or ""
    return hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:10]


_LIB = _CPP_DIR / f"libloader-{_host_tag()}.so"


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
            "-shared", "-fPIC", "-o", str(_LIB), str(_SRC), "-ljpeg", "-lpthread",
        ],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
            lib.decode_resize_batch.restype = ctypes.c_int
            lib.decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _unavailable = True
        return _lib


def native_loader_available() -> bool:
    return _load() is not None


def decode_resize_batch(paths, height: int, width: int, num_threads: int = 16) -> np.ndarray:
    """Decode + resize a list of JPEG paths → (N, H, W, 3) uint8.

    Raises ``FileNotFoundError``/``ValueError`` naming the first failing
    path (matching the PIL path's error surface)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/libjpeg missing)")
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    statuses = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.decode_resize_batch(
        arr,
        n,
        height,
        width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if failures:
        bad = int(np.argmax(statuses != 0))
        code = int(statuses[bad])
        if code == 1:
            raise FileNotFoundError(f"cannot open image: {paths[bad]}")
        raise ValueError(f"cannot decode image ({code}): {paths[bad]}")
    return out
