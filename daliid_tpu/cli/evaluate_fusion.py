"""Clean+distorted fusion evaluation CLI — the DaliID paper fusion.

Mirrors ``Person-ReID/evaluateCleanATModels.py:33-246``: load a clean-trained
and a distortion-trained model, then report CMC/mAP for every fusion
variant the reference evaluates:

1. feature concatenation (``evaluateCleanATModels.py:103-113``);
2. each model alone (``:129-130``);
3. simple distmat average (``:127-133``);
4. magnitude-weighted fusion under gap / gmp / both pooling
   (``:135-234``) — the paper's headline result uses GAP;
5. optional ROC dump (``:276-292``).

Example:
    python -m daliid_tpu.cli.evaluate_fusion --dataset Synthetic \
        --model_path_clean clean.npz --model_path_distortion at.npz
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from daliid_tpu.cli.evaluate import load_bundle
from daliid_tpu.data.briar import load_eval_splits
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.eval.fusion import (
    average_distmats,
    concat_features_distmat,
    magnitude_weighted_distmat,
    magnitude_weights,
    roc_arrays,
)
from daliid_tpu.eval.validate import Validator
from daliid_tpu.metrics.ranking import cosine_distance_matrix
from daliid_tpu.parallel.distributed import add_multihost_flags, maybe_initialize_from_args


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU clean+distorted fusion evaluation")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--model_name", type=str, default="resnet50")
    p.add_argument("--model_path_clean", type=str, default=None)
    p.add_argument("--model_path_distortion", type=str, default=None)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--roc_version", type=str, default=None, help="dump FPR/TPR arrays with this tag")
    p.add_argument(
        "--quantize", type=str, default=None, choices=["int8"],
        help="int8 post-training quantization for extraction, calibrated per "
             "(model, pooling) on its first batch (ops/quantize.py). Note the "
             "magnitude-weighted variants fuse on raw feature NORMS, which "
             "int8 perturbs by O(1e-3) relative — acceptable for the "
             "max(q,g) weighting but not bit-identical to fp",
    )
    p.add_argument(
        "--calib_batches", type=int, default=1,
        help="int8 calibration spans the first N extract batches "
             "(running absmax)",
    )
    # BRIAR npy-manifest ingest (--dataset BRIAR; the reference's fusion
    # CLI takes the same trio, evaluateCleanATModels.py:60)
    p.add_argument("--train_file_path", type=str, default=None)
    p.add_argument("--queries_file_path", type=str, default=None)
    p.add_argument("--gallery_file_path", type=str, default=None)
    add_multihost_flags(p)
    return p


def _report(tag, validator, distmat, queries, gallery, results):
    cmc, mAP = validator.rank(distmat, queries, gallery)
    print(f"[{tag}] mAP: {mAP:.2%}")
    for r in (1, 5, 10, 20):
        if r <= len(cmc):
            print(f"[{tag}] Rank-{r:<3}: {cmc[r - 1]:.2%}")
    results[tag] = {"mAP": float(mAP), "rank1": float(cmc[0])}
    return cmc, mAP


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

    clean = load_bundle(args.model_name, args.model_path_clean, img_size, dtype)
    dist = load_bundle(args.model_name, args.model_path_distortion, img_size, dtype)
    # pooling-switchable extractors: the reference flips model.feature
    # between gap/gmp/both on the same weights (evaluateCleanATModels.py:249-256)
    validator = Validator(img_size=img_size, batch_size=args.batch_size)
    results = {}

    def extract_with_pooling(bundle, table, pooling):
        # rebuild the module with the requested pooling on the same weights
        # (the reference flips model.feature in place,
        # evaluateCleanATModels.py:251-255); flax modules are frozen
        # dataclasses so we clone via dataclasses.replace
        import dataclasses as _dc

        pooled_module = bundle.module
        if getattr(pooled_module, "feature", pooling) != pooling:
            pooled_module = _dc.replace(pooled_module, feature=pooling)
        b = type(bundle)(
            module=pooled_module, variables=bundle.variables,
            feature_dim=bundle.feature_dim, name=bundle.name,
        )
        ex = FeatureExtractor(
            b, img_size=img_size, batch_size=args.batch_size,
            quantize=getattr(args, "quantize", None),
            calib_batches=getattr(args, "calib_batches", 1),
        )
        return ex.extract(table)

    # base embeddings (gap+gmp "both" pooling, the training-time head)
    q_c = extract_with_pooling(clean, queries, "both")
    g_c = extract_with_pooling(clean, gallery, "both")
    q_d = extract_with_pooling(dist, queries, "both")
    g_d = extract_with_pooling(dist, gallery, "both")

    # 1. concatenation
    _report("concat", validator, concat_features_distmat(q_c, q_d, g_c, g_d), queries, gallery, results)

    # 2. single models + 3. simple average
    d_clean = cosine_distance_matrix(jnp.asarray(q_c), jnp.asarray(g_c))
    d_dist = cosine_distance_matrix(jnp.asarray(q_d), jnp.asarray(g_d))
    _report("clean", validator, d_clean, queries, gallery, results)
    _report("distortion", validator, d_dist, queries, gallery, results)
    _report("average", validator, average_distmats(d_clean, d_dist), queries, gallery, results)

    # 4. magnitude-weighted fusion per pooling mode
    for pooling in ("gap", "gmp", "both"):
        q_mc = magnitude_weights(extract_with_pooling(clean, queries, pooling))
        g_mc = magnitude_weights(extract_with_pooling(clean, gallery, pooling))
        q_md = magnitude_weights(extract_with_pooling(dist, queries, pooling))
        g_md = magnitude_weights(extract_with_pooling(dist, gallery, pooling))
        fused = magnitude_weighted_distmat(d_clean, d_dist, q_mc, g_mc, q_md, g_md)
        _report(f"magnitude_{pooling}", validator, fused, queries, gallery, results)

        if args.roc_version and pooling == "gap":
            labels, scores = roc_arrays(np.asarray(fused), queries.pids, gallery.pids)
            from sklearn.metrics import roc_curve

            fpr, tpr, thr = roc_curve(labels, scores, pos_label=1)
            np.save(f"FPR_{args.roc_version}", fpr)
            np.save(f"TPR_{args.roc_version}", tpr)
            np.save(f"Thresholds_{args.roc_version}", thr)
            print("ROC Curve calculated!")

    return results


if __name__ == "__main__":
    _args = build_argparser().parse_args()
    maybe_initialize_from_args(_args)
    main(_args)
