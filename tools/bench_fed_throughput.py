"""End-to-end FED extraction throughput (VERDICT item 6).

Measures, on a realistic synthetic JPEG set at Market source dimensions
(128x64 JPEGs, decoded + bicubic-resized to 256x128):

1. host decode rate — the native C++ loader (libjpeg thread pool) and the
   PIL thread-pool fallback, in img/s;
2. end-to-end FED extraction — `FeatureExtractor.extract` (decode -> H2D ->
   jit forward, double-buffered), sustained img/s;
3. device-resident forward rate (the bench.py number) for comparison.

The gap between (2) and (3) in THIS harness is the ~29 MB/s tunnel between
host and chip (BENCH.md note); (1) shows whether the host decode side can
sustain the chip rate on a real TPU host.

Usage: python tools/bench_fed_throughput.py [--n 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--img_height", type=int, default=256)
    ap.add_argument("--img_width", type=int, default=128)
    ap.add_argument("--src_height", type=int, default=128)
    ap.add_argument("--src_width", type=int, default=64)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from daliid_tpu.data.registry import ReidTable
    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.models import get_model

    IMG = (args.img_height, args.img_width)
    root = tempfile.mkdtemp(prefix="fedbench_")
    rng = np.random.default_rng(0)
    paths = []
    print(f"writing {args.n} JPEGs at {args.src_height}x{args.src_width} ...")
    for i in range(args.n):
        arr = rng.integers(0, 256, (args.src_height, args.src_width, 3), np.uint8)
        p = os.path.join(root, f"{i:06d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    # 1) host decode rates
    from daliid_tpu.data.native_loader import decode_resize_batch, native_loader_available

    workers = min(16, 2 * (os.cpu_count() or 1))
    if native_loader_available():
        decode_resize_batch(paths[:64], *IMG, num_threads=workers)  # warm
        t0 = time.perf_counter()
        decode_resize_batch(paths, *IMG, num_threads=workers)
        native_rate = args.n / (time.perf_counter() - t0)
        print(f"native C++ decode+resize: {native_rate:.0f} img/s ({workers} threads)")
    else:
        native_rate = None
        print("native loader unavailable")

    import concurrent.futures as cf

    from daliid_tpu.augment.preprocess import decode_resize

    def pil_decode_all():
        out = np.empty((len(paths), *IMG, 3), np.uint8)

        def work(i):
            out[i] = decode_resize(paths[i], *IMG)

        with cf.ThreadPoolExecutor(workers) as ex:
            list(ex.map(work, range(len(paths))))
        return out

    pil_decode_all()  # warm
    t0 = time.perf_counter()
    pil_decode_all()
    pil_rate = args.n / (time.perf_counter() - t0)
    print(f"PIL thread-pool decode+resize: {pil_rate:.0f} img/s ({workers} threads)")

    # 2) end-to-end fed extraction
    bundle = get_model("resnet50", jax.random.key(0), img_size=IMG, dtype=jnp.bfloat16)
    table = ReidTable(
        paths=np.asarray(paths), pids=np.zeros(args.n, np.int64),
        camids=np.zeros(args.n, np.int64), kinds=np.asarray(["person"] * args.n),
        name="fedbench",
    )
    ex = FeatureExtractor(bundle, img_size=IMG, batch_size=args.batch,
                          compute_dtype=jnp.bfloat16, decode_workers=workers)
    ex.extract(table[: args.batch])  # warm/compile
    t0 = time.perf_counter()
    feats = ex.extract(table)
    fed_s = time.perf_counter() - t0
    fed_rate = args.n / fed_s
    print(f"fed extraction (decode→H2D→forward): {fed_rate:.0f} img/s "
          f"({fed_s:.1f}s for {args.n}, feature dim {feats.shape[1]})")

    # 3) device-resident forward rate
    dev_imgs = jax.device_put(
        rng.integers(0, 256, (args.batch, *IMG, 3), np.uint8), ex._batch_shard
    )
    scales = ex._scale_args if ex._scale_args is not None else {}
    out = ex._forward(ex._variables, dev_imgs, scales)
    jax.block_until_ready(out)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ex._forward(ex._variables, dev_imgs, scales)
    jax.block_until_ready(out)
    dev_rate = args.batch * iters / (time.perf_counter() - t0)
    print(f"device-resident forward: {dev_rate:.0f} img/s")

    import json

    print(json.dumps({
        "native_decode_img_s": native_rate,
        "pil_decode_img_s": pil_rate,
        "fed_extraction_img_s": fed_rate,
        "device_resident_img_s": dev_rate,
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
