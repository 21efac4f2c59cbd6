"""Sweep the ranking kernel's chunk sizes at DeepChange scale.

The counting scan runs at the VPU floor (~0.3 s of the 431 ms union-busy total — r5 erratum, BENCH.md §ranking-pallas,
tools/profile_ranking.py); the rest is per-chunk overhead (masks, gathers,
pads, loop bookkeeping). Larger query chunks / gallery blocks amortize it —
bounded by the (query_chunk, G) pad/transpose copies in HBM.

Usage: python tools/bench_ranking_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daliid_tpu.metrics import ranking as R

    NQ, NG, IDS = 17_527, 62_956, 521
    rng = np.random.default_rng(12)
    q_pids = rng.integers(0, IDS, NQ).astype(np.int32)
    g_pids = rng.integers(0, IDS, NG).astype(np.int32)
    q_camids = rng.integers(0, 17, NQ).astype(np.int32)
    g_camids = rng.integers(0, 17, NG).astype(np.int32)
    distmat = jnp.asarray(rng.random((NQ, NG), dtype=np.float32))
    ref = None

    for query_chunk in (512, 1024, 2048):
        for g_block in (8192, 16384, 65536):
            try:
                kw = dict(query_chunk=query_chunk, g_block=g_block)
                out = R.evaluate_rank_jax(
                    distmat, jnp.asarray(q_pids), jnp.asarray(g_pids),
                    jnp.asarray(q_camids), jnp.asarray(g_camids), **kw,
                )
                jax.block_until_ready(out)
                t0 = time.time()
                out = R.evaluate_rank_jax(
                    distmat, jnp.asarray(q_pids), jnp.asarray(g_pids),
                    jnp.asarray(q_camids), jnp.asarray(g_camids), **kw,
                )
                jax.block_until_ready(out)
                dt = time.time() - t0
                r1, mAP = float(out[0][0]), float(out[1])
                if ref is None:
                    ref = (r1, mAP)
                ok = "OK" if (abs(r1 - ref[0]) < 1e-6 and abs(mAP - ref[1]) < 1e-6) else "MISMATCH"
                print(f"query_chunk={query_chunk:5d} g_block={g_block:6d}: {dt:7.3f} s  {ok}")
            except Exception as e:  # OOM etc.
                print(f"query_chunk={query_chunk:5d} g_block={g_block:6d}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
