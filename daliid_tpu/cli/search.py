"""Identification-service CLI: enroll a gallery, search probes.

The serving counterpart of the batch eval CLIs: build a device-resident
sharded gallery index from a dataset split (or an .npz of embeddings), then
answer probe queries with ranked identities — the deployment shape of
``evaluate.py``'s extract→distmat→rank flow. Multi-head models (dual /
multipart / TransReID-JPM) serve as the feature-concat embedding
(``eval/matcher.py:serving_embedding``, the concat fusion protocol).

Examples:
    # enroll + query a dataset's gallery with its query split
    python -m daliid_tpu.cli.search --dataset Market --model_name resnet50 \
        --model_path weights.npz --topk 10

    # save gallery embeddings for reuse
    python -m daliid_tpu.cli.search --dataset Market --save_index gallery.npz
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from daliid_tpu.cli.evaluate import load_bundle
from daliid_tpu.data.registry import load_dataset
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.eval.matcher import GalleryIndex
from daliid_tpu.parallel.distributed import add_multihost_flags, maybe_initialize_from_args


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU gallery search service")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--model_name", type=str, default="resnet50")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument(
        "--quantize", type=str, default=None, choices=["int8"],
        help="int8 post-training quantization for probe/gallery extraction, "
             "calibrated lazily on the first batches (ops/quantize.py)",
    )
    p.add_argument(
        "--calib_batches", type=int, default=1,
        help="int8 calibration spans the first N extract batches "
             "(running absmax)",
    )
    p.add_argument(
        "--index_quantize", type=str, default=None, choices=["int8", "off"],
        help="'int8' stores the device-resident gallery as per-row symmetric "
             "int8 (4x enrolled identities per chip of HBM; probe scores run "
             "the MXU's double-rate int8 mode — eval/matcher.py); 'off' "
             "forces f32 when --load_index carries a saved int8 mode; "
             "default keeps the saved mode (f32 for fresh galleries)",
    )
    p.add_argument("--topk", type=int, default=10)
    p.add_argument(
        "--rerank", action="store_true",
        help="k-reciprocal re-rank of each probe's top shortlist "
             "(eval/rerank.py batched per probe; exact-f32 even on an int8 "
             "index). Scores become 1 - reranked distance.",
    )
    p.add_argument("--rerank_depth", type=int, default=64,
                   help="shortlist length fed to --rerank")
    p.add_argument("--save_index", type=str, default=None, help="save gallery embeddings to .npz")
    p.add_argument("--load_index", type=str, default=None, help="load gallery embeddings from .npz")
    p.add_argument("--max_probes", type=int, default=0, help="limit probes (0 = all)")
    add_multihost_flags(p)
    return p


def main(args):
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    img_size = (args.img_height, args.img_width)
    dtype = getattr(jnp, args.compute_dtype)
    splits = load_dataset(args.dataset, root=args.data_root)
    gallery, queries = splits["gallery"], splits["query"]

    bundle = load_bundle(args.model_name, args.model_path, img_size, dtype)
    extractor = FeatureExtractor(
        bundle, img_size=img_size, batch_size=args.batch_size,
        quantize=getattr(args, "quantize", None),
        calib_batches=getattr(args, "calib_batches", 1),
    )

    flag = getattr(args, "index_quantize", None)
    index_quantize = None if flag == "off" else flag
    if args.load_index:
        # one schema with GalleryIndex.save (legacy 'embeddings' accepted);
        # an explicit --index_quantize overrides the saved mode
        index = GalleryIndex.load(
            args.load_index,
            quantize="auto" if flag is None else index_quantize,
        )
        print(f"Loaded index: {index.num_gallery} entries from {args.load_index}")
    else:
        g_fvs = extractor.extract(gallery, verbose=True)
        index = GalleryIndex(g_fvs, gallery_pids=gallery.pids, quantize=index_quantize)
        if args.save_index:
            index.save(args.save_index)
            print(f"Saved index ({index.num_gallery} entries) to {args.save_index}")

    probes = queries if not args.max_probes else queries[np.arange(args.max_probes)]
    q_fvs = extractor.extract(probes, verbose=True)
    import time

    t0 = time.time()
    sims, ids, pids = index.search(
        q_fvs, k=args.topk,
        rerank=getattr(args, "rerank", False),
        rerank_depth=getattr(args, "rerank_depth", 64),
    )
    dt = time.time() - t0
    # a pid-less index (bare-embeddings .npz via --load_index) can still be
    # searched; identity accuracy just can't be scored
    acc_note = ""
    if pids is not None:
        acc_note = (f"; top-1 identity accuracy "
                    f"{float(np.mean(pids[:, 0] == probes.pids)):.2%}")
    print(
        f"searched {len(probes)} probes over {index.num_gallery} gallery in "
        f"{dt * 1e3:.1f} ms ({len(probes) / max(dt, 1e-9):.0f} probes/s)"
        + acc_note
    )
    for i in range(min(3, len(probes))):
        hits = pids[i].tolist() if pids is not None else ids[i].tolist()
        label = "pids" if pids is not None else "gallery rows"
        print(f"probe {i} (pid {probes.pids[i]}): top-{args.topk} {label} {hits}")
    return sims, ids, pids


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    maybe_initialize_from_args(_args)
    main(_args)
