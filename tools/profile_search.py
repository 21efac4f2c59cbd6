"""Per-fusion device-time profile of the large-scale SQ8 gallery search.

The capacity bench (BENCH.md) measured ~21 ms device time for a
single-probe search of a 4.19M x 2048 int8 gallery vs a ~10.5 ms HBM
roofline for the 8.6 GB sweep. Where does the other half go — the int8
dot, the padding mask, or lax.top_k over 4M columns? Joins an xprof trace
with HLO op rows like tools/profile_ranking.py.

Usage: python tools/profile_search.py [--log2_rows 20] [--batch 1]
(2^20 rows keeps host build time reasonable in this harness; the program
structure is row-count-independent.)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_eval_forward import aggregate_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2_rows", type=int, default=20)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--quantize", type=str, default="int8", choices=["int8", "f32"])
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from daliid_tpu.eval.matcher import GalleryIndex

    rng = np.random.default_rng(12)
    n = 1 << args.log2_rows
    block = rng.random(size=(min(n, 1 << 16), args.dim), dtype=np.float32) - 0.5
    big = np.tile(block, (max(1, n >> 16), 1))
    del block
    t0 = time.time()
    index = GalleryIndex(
        big, quantize=None if args.quantize == "f32" else args.quantize
    )
    del big
    jax.block_until_ready(index._gallery)
    print(f"{n:,} x {args.dim} {args.quantize} index built in {time.time() - t0:.1f} s")

    probes = rng.random(size=(args.batch, args.dim), dtype=np.float32) - 0.5
    index.search(probes, k=args.k)  # warm/compile
    t0 = time.time()
    for _ in range(args.iters):
        out = index.search(probes, k=args.k)
    wall = (time.time() - t0) / args.iters
    print(f"warm wall: {wall * 1e3:.2f} ms/search (batch {args.batch})")

    tdir = tempfile.mkdtemp(prefix="search_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            out = index.search(probes, k=args.k)
    del out

    path, totals, counts = aggregate_trace(tdir)
    total_us = sum(us for name, us in totals.items() if not name.startswith("jit_"))
    print(f"trace: {path}\ndevice (non-module rows): "
          f"{total_us / 1e3 / args.iters:.2f} ms/iter\n")
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
