"""Two-model ensemble evaluation CLI — the ``evaluate_ensembled_models.py``
equivalent.

Mirrors ``Person-ReID/evaluate_ensembled_models.py:59-314``: load two trained
models (possibly different backbones), compute each model's cosine distmat,
evaluate each individually and their uniform average
(``evaluate_ensembled_models.py:275-314``).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from daliid_tpu.cli.evaluate import load_bundle
from daliid_tpu.data.briar import load_eval_splits
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.eval.fusion import average_distmats
from daliid_tpu.eval.validate import get_validator
from daliid_tpu.metrics.ranking import cosine_distance_matrix
from daliid_tpu.parallel.distributed import add_multihost_flags, maybe_initialize_from_args


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU two-model ensemble evaluation")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--model_name01", type=str, default="resnet50")
    p.add_argument("--model_name02", type=str, default="resnet50")
    p.add_argument("--model_path01", type=str, default=None)
    p.add_argument("--model_path02", type=str, default=None)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument(
        "--quantize", type=str, default=None, choices=["int8"],
        help="int8 post-training quantization for both models' extraction, "
             "calibrated per model on its first batches (ops/quantize.py)",
    )
    p.add_argument(
        "--calib_batches", type=int, default=1,
        help="int8 calibration spans the first N extract batches "
             "(running absmax)",
    )
    # BRIAR npy-manifest ingest (--dataset BRIAR; the reference's ensemble
    # CLI takes the same trio, evaluate_ensembled_models.py:77-128,644-646)
    p.add_argument("--train_file_path", type=str, default=None)
    p.add_argument("--queries_file_path", type=str, default=None)
    p.add_argument("--gallery_file_path", type=str, default=None)
    add_multihost_flags(p)
    return p


def main(args):
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    img_size = (args.img_height, args.img_width)
    dtype = getattr(jnp, args.compute_dtype)
    splits = load_eval_splits(
        args.dataset, root=args.data_root,
        train_npy=getattr(args, "train_file_path", None),
        queries_npy=getattr(args, "queries_file_path", None),
        gallery_npy=getattr(args, "gallery_file_path", None),
    )
    queries, gallery = splits["query"], splits["gallery"]
    # manifest eval ranks with the standard protocol (calculate_metrics,
    # evaluate_ensembled_models.py:318-330), not the training-time
    # validateBRIAR argsort CMC
    validator = get_validator("standard" if args.dataset == "BRIAR" else args.dataset,
                              img_size=img_size, batch_size=args.batch_size)

    results = {}
    distmats = []
    for tag, name, path in (
        ("model01", args.model_name01, args.model_path01),
        ("model02", args.model_name02, args.model_path02),
    ):
        bundle = load_bundle(name, path, img_size, dtype)
        ex = FeatureExtractor(
            bundle, img_size=img_size, batch_size=args.batch_size,
            quantize=getattr(args, "quantize", None),
            calib_batches=getattr(args, "calib_batches", 1),
        )
        q = ex.extract(queries, verbose=True)
        g = ex.extract(gallery, verbose=True)
        d = cosine_distance_matrix(jnp.asarray(q), jnp.asarray(g))
        distmats.append(d)
        cmc, mAP = validator.rank(d, queries, gallery)
        print(f"[{tag}] mAP: {mAP:.2%} Rank-1: {cmc[0]:.2%}")
        results[tag] = {"mAP": float(mAP), "rank1": float(cmc[0])}

    ens = average_distmats(*distmats)
    cmc, mAP = validator.rank(ens, queries, gallery)
    print(f"[ensemble] mAP: {mAP:.2%} Rank-1: {cmc[0]:.2%}")
    results["ensemble"] = {"mAP": float(mAP), "rank1": float(cmc[0])}
    return results


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    maybe_initialize_from_args(_args)
    main(_args)
