"""Profile the AT train step on the real chip (VERDICT r2 item 4, r3 item 3).

Times the augmentation dispatch and the fused train step separately on
device-resident protocol batches (default 384 images = P16*K12*2 pairs,
256x128, bf16), and optionally dumps a jax.profiler trace.

``--model`` selects the training configuration: the flagship CNN
(``resnet50``, mainKIT.py's default), the plain ViT-B
(``vit``, Encoders.py:194-215), or the TransReID-JPM transformer
(``transreid_jpm``, make_models.py:221-389 — the reference's other
training family; built with a softmax id head, num_classes = the
synthetic id count, like build_transformer_local).

Usage: python tools/profile_train_step.py [--model vit] [--trace] [--batch 384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--model", type=str, default="resnet50",
                    choices=["resnet50", "vit", "transreid_jpm"])
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--img_height", type=int, default=256)
    ap.add_argument("--img_width", type=int, default=128)
    ap.add_argument("--remat", type=str, default="none",
                    help="ViT family: explicit per-block activation "
                         "checkpointing (models/vit.REMAT_MODES); measured "
                         "slower than XLA auto-remat at the protocol batch "
                         "(BENCH.md §transformer-train) — memory knob for "
                         "bigger batches")
    ap.add_argument("--pallas_attention", action="store_true",
                    help="ViT family: fused-attention Pallas kernel — its "
                         "custom VJP recomputes the (N, N) probs in-kernel, "
                         "removing them from saved activations (less XLA "
                         "auto-remat at big batches)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches per optimizer step (grads averaged, "
                         "one Adam+EMA): saved activations scale with "
                         "batch/N, so >HBM batches skip XLA's auto-remat "
                         "recompute — the VERDICT r4 transformer-train lever")
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.models import build_model_pair
    from daliid_tpu.train.sampler import PKBatchSampler
    from daliid_tpu.train.trainer import Trainer

    import tempfile

    IMG = (args.img_height, args.img_width)
    B = args.batch
    root = tempfile.mkdtemp(prefix="prof_")
    splits, turb = make_synthetic_dataset(
        root, num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1],
    )
    train = splits["train"]
    C = 16
    model_kw = {}
    if args.model == "transreid_jpm":
        # the reference's JPM training config carries a per-id softmax
        # classifier (make_models.py:260-277) fed the batch labels
        model_kw = dict(num_classes=C, id_loss_type="softmax")
    if args.pallas_attention:
        model_kw["use_pallas_attention"] = True
    if args.remat != "none":
        from daliid_tpu.models.factory import REMAT_MODELS
        from daliid_tpu.models.vit import REMAT_MODES

        if args.remat not in REMAT_MODES:
            raise SystemExit(f"--remat must be one of {REMAT_MODES}")
        if args.model not in REMAT_MODELS:
            raise SystemExit(
                f"--remat only applies to {sorted(REMAT_MODELS)}; the "
                f"{args.model!r} factory would silently drop it"
            )
        model_kw["remat"] = args.remat
    online, momentum = build_model_pair(
        args.model, jax.random.key(0), img_size=IMG, dtype=jnp.bfloat16, **model_kw)
    sampler = PKBatchSampler(train, train.pids, P=2, K=2, kind_of_transform=1,
                             turbulence_dir=turb, seed=0)
    trainer = Trainer(online, momentum, sampler, img_size=IMG, num_epochs=250,
                      compute_dtype=jnp.bfloat16, extractor_batch=256, decode_workers=8,
                      grad_accum=args.grad_accum)

    rng = np.random.default_rng(0)
    D = online.feature_dim
    images_u8 = jax.device_put(
        rng.integers(0, 256, (B, *IMG, 3), dtype=np.uint8), trainer._batch_shard)
    labels = jax.device_put(rng.integers(0, C, B).astype(np.int32), trainer._batch_shard)
    dist = np.zeros(B, np.int32); dist[1::2] = rng.integers(1, 6, B // 2)
    dist = jax.device_put(dist, trainer._batch_shard)
    mask = jax.device_put(np.ones(B, bool), trainer._batch_shard)
    camids = jax.device_put(np.zeros(B, np.int32), trainer._batch_shard)
    centers = jax.device_put(
        np.linalg.qr(rng.normal(size=(D, C)))[0].T[:C].astype(np.float32), trainer._replicated)
    proxies = jax.device_put(
        (lambda x: x / np.linalg.norm(x, axis=1, keepdims=True))(
            rng.normal(size=(5 * C, D)).astype(np.float32)), trainer._replicated)
    plabels = jax.device_put(np.repeat(np.arange(C), 5).astype(np.int32), trainer._replicated)
    epoch_arr = jax.device_put(jnp.float32(3), trainer._replicated)
    key = jax.random.key(1)

    def one_aug():
        return trainer._augment(images_u8, key)

    images = one_aug()
    images.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        images = one_aug()
    images.block_until_ready()
    aug_ms = (time.perf_counter() - t0) / args.iters * 1e3

    def one_step():
        s, m = trainer._train_step(
            trainer.state, images, labels, dist, mask, camids,
            centers, proxies, plabels, epoch_arr, key)
        return s, m

    trainer.state, m = one_step()
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        trainer.state, m = one_step()
    jax.block_until_ready(m)
    step_ms = (time.perf_counter() - t0) / args.iters * 1e3

    print(f"{args.model}: augment: {aug_ms:.2f} ms | train_step: {step_ms:.2f} ms | "
          f"total {aug_ms + step_ms:.2f} ms → {B / (aug_ms + step_ms) * 1e3:.0f} img/s")

    if args.trace:
        tdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "traces")
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(3):
                images = one_aug()
                trainer.state, m = one_step()
            jax.block_until_ready(m)
        print(f"trace written to {tdir}")


if __name__ == "__main__":
    main()
