"""End-to-end DaliID pipeline demonstration on synthetic data.

Reproduces the reference's full experimental flow (SURVEY.md §3) hermetically:

1. train a CLEAN model (``kind_of_transform=0``) and an AT model
   (``kind_of_transform=1``, turbulence-paired batches) — the two runs
   behind ``log_CL_training_*`` / ``log_AT_training_*``;
2. evaluate each on the clean gallery and on a turbulence-distorted gallery
   (``extractFeatures(..., turb_strength)`` path);
3. fuse them with concat / average / magnitude-weighted ensembling
   (``evaluateCleanATModels.py``) on the distorted gallery.

Usage: python tools/demo_daliid_pipeline.py [--epochs 10] [--root DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--img_height", type=int, default=256)
    ap.add_argument("--img_width", type=int, default=128)
    ap.add_argument("--model_name", type=str, default="resnet50")
    ap.add_argument("--compute_dtype", type=str, default="bfloat16")
    ap.add_argument("--turb_strength", type=int, default=4)
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.eval.fusion import (
        average_distmats,
        concat_features_distmat,
        magnitude_weighted_distmat,
        magnitude_weights,
    )
    from daliid_tpu.eval.validate import Validator
    from daliid_tpu.metrics.ranking import cosine_distance_matrix
    from daliid_tpu.models import build_model_pair
    from daliid_tpu.train.sampler import PKBatchSampler
    from daliid_tpu.train.trainer import Trainer

    root = args.root or tempfile.mkdtemp(prefix="daliid_demo_")
    img_size = (args.img_height, args.img_width)
    dtype = getattr(jnp, args.compute_dtype)
    print(f"dataset root: {root}")
    splits, turb_dir = make_synthetic_dataset(
        root, num_ids=16, imgs_per_id_train=12, imgs_per_id_test=6,
        height=img_size[0], width=img_size[1], with_turbulence=True,
    )
    # render turbulence for gallery too (distorted-gallery eval needs companions)
    from daliid_tpu.data.synthetic import _turbulence_render
    from PIL import Image

    rng = np.random.default_rng(7)
    for p in list(splits["gallery"].paths) + list(splits["query"].paths):
        img = Image.open(str(p))
        stem = os.path.basename(str(p))[:-4]
        for s in (args.turb_strength,):
            out = os.path.join(turb_dir, f"{stem}_turbstrength{s}.jpg")
            if not os.path.exists(out):
                _turbulence_render(img, s, rng).save(out, quality=92)

    validator = Validator(img_size=img_size, batch_size=256, max_rank=10)

    def train_model(kind, tag):
        online, momentum = build_model_pair(
            args.model_name, jax.random.key(12), img_size=img_size, dtype=dtype
        )
        sampler = PKBatchSampler(
            splits["train"], splits["train"].pids, P=16, K=12,
            kind_of_transform=kind, turbulence_dir=turb_dir if kind == 1 else None,
            seed=12,
        )
        trainer = Trainer(
            online, momentum, sampler, img_size=img_size, num_epochs=max(args.epochs, 2),
            base_lr=3.5e-4, tau=0.05, beta=0.9, lambda_proxy=0.4,
            compute_dtype=dtype, extractor_batch=256,
        )
        for epoch in range(1, args.epochs + 1):
            m = trainer.train_epoch(epoch)
            print(f"[{tag}] epoch {epoch}: loss={m['loss']:.4f} acc_bal={m['batch_acc_bal']:.3f} "
                  f"({m['epoch_seconds']:.1f}s)")
        return trainer

    clean_trainer = train_model(0, "clean")
    at_trainer = train_model(1, "AT")

    def extractor_for(trainer):
        trainer.extractor.update_variables(trainer.online_variables())
        return trainer.extractor

    results = {}
    for gallery_kind, turb in (("clean-gallery", None), ("distorted-gallery", args.turb_strength)):
        fvs = {}
        for tag, tr in (("clean", clean_trainer), ("AT", at_trainer)):
            ex = extractor_for(tr)
            fvs[tag] = {
                "q": ex.extract(splits["query"], turbulence_dir=turb_dir if turb else None,
                                turb_strength=turb),
                "g": ex.extract(splits["gallery"], turbulence_dir=turb_dir if turb else None,
                                turb_strength=turb),
            }
            cmc, mAP = validator.rank(
                validator.distance_matrix(fvs[tag]["q"], fvs[tag]["g"]),
                splits["query"], splits["gallery"],
            )
            results[f"{gallery_kind}/{tag}"] = (float(cmc[0]), float(mAP))
            print(f"[{gallery_kind}] {tag}: R1={cmc[0]:.3f} mAP={mAP:.3f}")

        d_c = cosine_distance_matrix(jnp.asarray(fvs["clean"]["q"]), jnp.asarray(fvs["clean"]["g"]))
        d_a = cosine_distance_matrix(jnp.asarray(fvs["AT"]["q"]), jnp.asarray(fvs["AT"]["g"]))
        fusions = {
            "concat": concat_features_distmat(fvs["clean"]["q"], fvs["AT"]["q"],
                                              fvs["clean"]["g"], fvs["AT"]["g"]),
            "average": average_distmats(d_c, d_a),
            "magnitude": magnitude_weighted_distmat(
                d_c, d_a,
                magnitude_weights(fvs["clean"]["q"]), magnitude_weights(fvs["clean"]["g"]),
                magnitude_weights(fvs["AT"]["q"]), magnitude_weights(fvs["AT"]["g"]),
            ),
        }
        for name, d in fusions.items():
            cmc, mAP = validator.rank(d, splits["query"], splits["gallery"])
            results[f"{gallery_kind}/fusion-{name}"] = (float(cmc[0]), float(mAP))
            print(f"[{gallery_kind}] fusion-{name}: R1={cmc[0]:.3f} mAP={mAP:.3f}")

    print("\n=== summary (R1, mAP) ===")
    for k, v in results.items():
        print(f"{k}: {v[0]:.3f}, {v[1]:.3f}")
    return results


if __name__ == "__main__":
    main()
