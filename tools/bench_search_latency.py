"""Serving-path latency: GalleryIndex top-k search at Market scale.

Measures single-probe latency and batched-probe throughput against a
device-resident 15,913 x 2048 gallery (the identification-service shape of
cli/search.py) on the real chip.

Usage: python tools/bench_search_latency.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from daliid_tpu.eval.matcher import GalleryIndex

    NG, D, K = 15_913, 2048, 10
    rng = np.random.default_rng(12)
    index = GalleryIndex(
        rng.normal(size=(NG, D)).astype(np.float32), rng.integers(0, 751, NG)
    )

    for nq in (1, 64, 512):
        probes = rng.normal(size=(nq, D)).astype(np.float32)
        index.search(probes, k=K)  # warm/compile
        iters = 50 if nq == 1 else 20
        t0 = time.time()
        for _ in range(iters):
            out = index.search(probes, k=K)
        dt = (time.time() - t0) / iters
        print(f"search batch={nq:4d} k={K}: {dt * 1e3:7.2f} ms "
              f"({nq / dt:9.0f} probes/s)")

    # enrollment churn: adds amortize to log-many recompiles. Each add ends
    # in an async device_put of the re-sharded gallery — block on the final
    # buffer so the measured time includes the in-flight uploads.
    import jax

    t0 = time.time()
    for i in range(32):
        index.add(rng.normal(size=(1, D)).astype(np.float32), np.asarray([1000 + i]))
    jax.block_until_ready(index._gallery)
    dt = time.time() - t0
    out = index.search(rng.normal(size=(1, D)).astype(np.float32), k=K)
    print(f"32 single-row enrollments: {dt * 1e3:.1f} ms total "
          f"({dt / 32 * 1e3:.2f} ms/add); index now {index.num_gallery} rows")


if __name__ == "__main__":
    main()
