"""Serving-path latency: GalleryIndex top-k search at Market scale.

Measures single-probe latency and batched-probe throughput against a
device-resident 15,913 x 2048 gallery (the identification-service shape of
cli/search.py) on the real chip — for both the f32 index and the SQ8
(``quantize="int8"``) index, whose gallery rows live in HBM at 1 byte/dim
and whose probe scores run the MXU's double-rate int8 mode.

``--capacity`` additionally builds a 2^22-row (4.19M identity) int8 index —
8.6 GB of HBM where the f32 equivalent (34 GB) cannot exist on a 16 GB v5e
chip — and measures search latency at that scale. The upload rides this
harness's ~29 MB/s tunnel (BENCH.md §fed), so enrollment takes minutes here;
on a real PCIe host it is seconds.

Usage: python tools/bench_search_latency.py [--capacity]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_index(index, rng, D, K, label):
    import numpy as np

    for nq in (1, 64, 512):
        probes = rng.normal(size=(nq, D)).astype(np.float32)
        index.search(probes, k=K)  # warm/compile
        iters = 50 if nq == 1 else 20
        t0 = time.time()
        for _ in range(iters):
            out = index.search(probes, k=K)
        dt = (time.time() - t0) / iters
        print(f"[{label}] search batch={nq:4d} k={K}: {dt * 1e3:7.2f} ms "
              f"({nq / dt:9.0f} probes/s)")


def main():
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from daliid_tpu.eval.matcher import GalleryIndex

    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", action="store_true",
                    help="also build the 2^22-row int8 index (8.6 GB HBM)")
    ap.add_argument("--capacity_only", action="store_true",
                    help="skip the Market-scale benches (several minutes of "
                         "tunnel RTTs) and run just the capacity leg")
    args = ap.parse_args()
    if args.capacity_only:
        args.capacity = True

    NG, D, K = 15_913, 2048, 10
    rng = np.random.default_rng(12)
    import jax

    if args.capacity_only:
        _bench_capacity(rng, D, K)
        return
    gallery = rng.normal(size=(NG, D)).astype(np.float32)
    pids = rng.integers(0, 751, NG)

    for quantize in (None, "int8"):
        label = quantize or "f32"
        index = GalleryIndex(gallery, pids, quantize=quantize)
        _bench_index(index, rng, D, K, label)

    # enrollment churn: NG=15,913 pads to capacity 16,384, so all 32
    # single-row adds take the in-place dynamic_update_slice path — a few
    # KB transferred per add (two tunnel RTTs here, ~1 ms on a PCIe host).
    # Block on the final buffer so the measured time includes in-flight
    # device work. Before the in-place path this loop re-uploaded the full
    # ~128 MB gallery per add (3.04 s/add measured through the tunnel).
    index = GalleryIndex(gallery, pids)
    t0 = time.time()
    for i in range(32):
        index.add(rng.normal(size=(1, D)).astype(np.float32), np.asarray([1000 + i]))
    jax.block_until_ready(index._gallery)
    dt = time.time() - t0
    out = index.search(rng.normal(size=(1, D)).astype(np.float32), k=K)
    print(f"32 single-row enrollments: {dt * 1e3:.1f} ms total "
          f"({dt / 32 * 1e3:.2f} ms/add); index now {index.num_gallery} rows")

    if not args.capacity:
        return
    del index
    _bench_capacity(rng, D, K)


def _bench_capacity(rng, D, K):
    import jax
    import numpy as np

    from daliid_tpu.eval.matcher import GalleryIndex

    NG_BIG = 1 << 22  # 4,194,304 rows = exactly one power-of-two shard
    print(f"building {NG_BIG:,} x {D} int8 index "
          f"({NG_BIG * D / 2**30:.1f} GiB HBM; f32 would need "
          f"{NG_BIG * D * 4 / 2**30:.0f} GiB — over a v5e's 16 GiB)...",
          flush=True)
    # Row content doesn't affect search latency or memory, so tile a random
    # block instead of generating 8.6G elements on one core (measured 423 s;
    # the tile is 64x faster and exercises the identical device path).
    t0 = time.time()
    block = rng.random(size=(1 << 16, D), dtype=np.float32) - 0.5
    big = np.tile(block, (NG_BIG >> 16, 1))
    del block
    print(f"  host gallery materialized in {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    index = GalleryIndex(big, quantize="int8")
    del big  # the index holds its own normalized host copy
    t1 = time.time()
    print(f"  normalize + quantize in {t1 - t0:.1f} s", flush=True)
    jax.block_until_ready(index._gallery)
    print(f"  upload in {time.time() - t1:.1f} s "
          f"(tunnel-bound in this harness: ~29 MB/s)", flush=True)
    for nq in (1, 64):
        probes = rng.random(size=(nq, D), dtype=np.float32) - 0.5
        index.search(probes, k=K)  # warm/compile
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            index.search(probes, k=K)
        dt = (time.time() - t0) / iters
        print(f"[int8 4.19M-row] search batch={nq:4d} k={K}: {dt * 1e3:7.2f} ms "
              f"({nq / dt:9.0f} probes/s)", flush=True)


if __name__ == "__main__":
    main()
