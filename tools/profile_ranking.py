"""Per-fusion device-time profile of the DeepChange-scale ranking program.

Where do the ~2.2 s go — the counting scan, the per-chunk top_k, or the
mask setup? Joins an xprof trace with HLO op_name metadata like
tools/profile_eval_forward.py.

Usage: python tools/profile_ranking.py [--nq 17527] [--ng 62956]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_eval_forward import aggregate_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=17_527)
    ap.add_argument("--ng", type=int, default=62_956)
    ap.add_argument("--ids", type=int, default=521)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np

    from daliid_tpu.metrics.ranking import evaluate_rank_jax, max_positives_bound

    rng = np.random.default_rng(12)
    q_pids = rng.integers(0, args.ids, args.nq).astype(np.int32)
    g_pids = rng.integers(0, args.ids, args.ng).astype(np.int32)
    q_camids = rng.integers(0, 17, args.nq).astype(np.int32)
    g_camids = rng.integers(0, 17, args.ng).astype(np.int32)
    distmat = jnp.asarray(rng.random((args.nq, args.ng), dtype=np.float32))
    mp = max_positives_bound(g_pids)
    print(f"max_positives bound: {mp}")

    def run():
        return evaluate_rank_jax(
            distmat, jnp.asarray(q_pids), jnp.asarray(g_pids),
            jnp.asarray(q_camids), jnp.asarray(g_camids),
        )

    cmc, mAP = run()
    jax.block_until_ready((cmc, mAP))

    import time

    t0 = time.time()
    out = run()
    jax.block_until_ready(out)
    print(f"warm wall: {time.time() - t0:.3f} s")

    tdir = tempfile.mkdtemp(prefix="rank_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)

    path, totals, counts = aggregate_trace(tdir)
    total_us = sum(us for n, us in totals.items() if not n.startswith("jit_"))
    print(f"trace: {path}\ndevice (non-module rows): {total_us / 1e3 / args.iters:.1f} ms/iter\n")
    print(f"{'op':44s} {'calls':>6s} {'ms/iter':>9s} {'%':>6s}")
    shown = 0
    for name, us in totals.most_common():
        if name.startswith("jit_"):
            continue
        print(f"{name[:44]:44s} {counts[name]:6d} {us / 1e3 / args.iters:9.2f} "
              f"{100 * us / total_us:6.1f}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
