"""DaliID training-quality signature as a regression test.

Fixed-seed short clean-vs-AT training on the hermetic synthetic set (stripes
appearance: identity carried by blur-sensitive geometry), asserting the
method's signature so a silent training-quality regression fails CI instead
of hiding in a demo script:

  (a) the AT (distortion-paired) model beats the clean model on the
      turbulence-distorted gallery (the DaliID claim, BENCH.md §signature;
      reference evidence: log_AT vs log_CL training logs);
  (b) CMC/mAP land inside pinned bands;
  (c) the loss curve is finite and decreasing.

Runs on the 8-device virtual CPU mesh (~7 min); marked slow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.data import make_synthetic_dataset
from daliid_tpu.eval.validate import Validator
from daliid_tpu.models.factory import ModelBundle
from daliid_tpu.models.resnet import ResNet50ReID
from daliid_tpu.train.sampler import PKBatchSampler
from daliid_tpu.train.trainer import Trainer

IMG = (64, 32)
EPOCHS = 8


@pytest.fixture(scope="module")
def signature_runs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("signature"))
    splits, turb = make_synthetic_dataset(
        root, num_ids=10, imgs_per_id_train=8, imgs_per_id_test=4,
        height=IMG[0], width=IMG[1], with_turbulence=True,
        appearance="stripes", turbulence_splits=("train", "gallery", "query"),
    )

    def make_pair():
        m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
        v = m.init({"params": jax.random.key(12)}, jnp.zeros((1, *IMG, 3)), train=False)
        online = ModelBundle(module=m, variables=v, feature_dim=2048, name="tiny_r50")
        momentum = ModelBundle(
            module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=2048, name="tiny_r50"
        )
        return online, momentum

    def train(kind):
        online, momentum = make_pair()
        sampler = PKBatchSampler(
            splits["train"], splits["train"].pids, P=5, K=4, kind_of_transform=kind,
            turbulence_dir=turb if kind == 1 else None, seed=12,
        )
        trainer = Trainer(
            online, momentum, sampler, img_size=IMG, num_epochs=EPOCHS,
            base_lr=3.5e-4, tau=0.05, beta=0.9, lambda_proxy=0.4,
            compute_dtype=jnp.float32, extractor_batch=64,
        )
        losses = [trainer.train_epoch(e)["loss"] for e in range(1, EPOCHS + 1)]
        return trainer, losses

    clean_trainer, clean_losses = train(0)
    at_trainer, at_losses = train(1)

    validator = Validator(img_size=IMG, batch_size=64, max_rank=10)
    metrics = {}
    for strength in (None, 2, 3):
        for tag, tr in (("clean", clean_trainer), ("AT", at_trainer)):
            tr.extractor.update_variables(tr.online_variables())
            kw = {"turbulence_dir": turb, "turb_strength": strength} if strength else {}
            q = tr.extractor.extract(splits["query"], **kw)
            g = tr.extractor.extract(splits["gallery"], **kw)
            cmc, mAP = validator.rank(
                validator.distance_matrix(q, g), splits["query"], splits["gallery"]
            )
            metrics[(strength, tag)] = (float(cmc[0]), float(mAP))
    return {"losses": {"clean": clean_losses, "AT": at_losses}, "metrics": metrics}


@pytest.mark.slow
def test_loss_curves_finite_and_decreasing(signature_runs):
    for tag, losses in signature_runs["losses"].items():
        assert all(np.isfinite(losses)), (tag, losses)
        assert max(losses) < 8.0, (tag, losses)
        # settles below the early-training level (epoch-2 BN/center warm-up
        # spike included in the early mean)
        assert np.mean(losses[-3:]) < np.mean(losses[:2]) - 0.1, (tag, losses)


@pytest.mark.slow
def test_clean_gallery_band(signature_runs):
    for tag in ("clean", "AT"):
        r1, mAP = signature_runs["metrics"][(None, tag)]
        assert r1 >= 0.95 and mAP >= 0.95, (tag, r1, mAP)


@pytest.mark.slow
def test_at_beats_clean_on_distorted_gallery(signature_runs):
    """The DaliID signature: distortion-adaptive training wins under
    turbulence. Calibrated (r3, after the torch-exact BN running-var rule
    landed in models/norm.py): s2 mAP 0.852 vs 0.803, s3 0.713 vs 0.699 —
    the s3 margin is real but narrow at this toy scale, so it gets a
    strictly-wins bound while s2 keeps a margin."""
    margins = {2: 0.02, 3: 0.005}
    for strength in (2, 3):
        _, clean_map = signature_runs["metrics"][(strength, "clean")]
        _, at_map = signature_runs["metrics"][(strength, "AT")]
        assert at_map >= clean_map + margins[strength], (strength, clean_map, at_map)


@pytest.mark.slow
def test_distorted_gallery_bands(signature_runs):
    r1_s2, map_s2 = signature_runs["metrics"][(2, "AT")]
    assert map_s2 >= 0.82 and r1_s2 >= 0.85, (r1_s2, map_s2)
    _, map_s3 = signature_runs["metrics"][(3, "AT")]
    assert map_s3 >= 0.62, map_s3
    # the clean model must also remain inside a sane band (a dataset or
    # eval-path regression would move it wildly)
    _, cmap_s2 = signature_runs["metrics"][(2, "clean")]
    assert 0.55 <= cmap_s2 <= 0.97, cmap_s2
