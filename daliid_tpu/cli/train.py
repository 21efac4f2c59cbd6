"""Training CLI — the ``mainKIT.py`` equivalent.

Mirrors the reference driver (``Person-ReID/mainKIT.py:58-201``): build the
(online, momentum) pair, load the dataset, pre-training sanity eval, then
the epoch loop with the 3-phase LR schedule, periodic validation of both
models, best-Rank-1 checkpointing, and metric journaling (JSON instead of
joblib). Flags mirror ``mainKIT.py:316-344``.

Example (hermetic smoke):
    python -m daliid_tpu.cli.train --dataset Synthetic --data_root /tmp/dd \
        --model_name resnet50 --epochs 2 --P 4 --K 2 --eval_freq 1
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from daliid_tpu.config import TrainConfig
from daliid_tpu.data.registry import load_dataset
from daliid_tpu.eval.validate import get_validator, msmt17_balanced_accuracy
from daliid_tpu.models import build_model_pair
from daliid_tpu.models.factory import MARGIN_HEAD_MODELS, REMAT_MODELS, SIE_MODELS
from daliid_tpu.models.vit import REMAT_MODES
from daliid_tpu.parallel.distributed import add_multihost_flags, maybe_initialize_from_args
from daliid_tpu.train.checkpoint import CheckpointManager, save_variables
from daliid_tpu.train.sampler import PKBatchSampler
from daliid_tpu.train.trainer import Trainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU training")
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--model_name", type=str, default="resnet50")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--lr", type=float, default=3.5e-4)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--P", type=int, default=16)
    p.add_argument("--K", type=int, default=12)
    p.add_argument("--tau", type=float, default=0.05)
    p.add_argument("--beta", type=float, default=0.999)
    p.add_argument("--lambda_proxy", type=float, default=0.4)
    p.add_argument("--epochs", "--number_of_epoches", dest="epochs", type=int, default=250)
    p.add_argument("--num_iter", type=int, default=1)
    p.add_argument("--momentum_on_feature_extraction", type=int, default=0)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--turbulence_dir_path", type=str, default=None)
    p.add_argument("--is_clean_training", action="store_true")
    p.add_argument("--kind_of_transform", type=int, default=1)
    p.add_argument("--path_to_save_models", type=str, default="checkpoints")
    p.add_argument("--path_to_save_metrics", type=str, default="metrics")
    p.add_argument("--version", type=str, default="v0")
    p.add_argument("--eval_freq", type=int, default=5)
    p.add_argument("--ckpt_freq", type=int, default=1,
                   help="save a crash-resume checkpoint (full state + RNG) every N "
                        "epochs under <save_dir>/latest; 0 disables")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--extractor_batch", type=int, default=512)
    p.add_argument(
        "--mining_quantize", type=str, default=None, choices=["int8"],
        help="int8 PTQ for the per-epoch mining re-embedding "
             "(train_encodersKIT.py:110 equivalent); validation extraction "
             "stays full-precision. Recalibrates each epoch on the new "
             "weights' first mining batches",
    )
    p.add_argument("--mining_calib_batches", type=int, default=1)
    p.add_argument(
        "--grad_accum", type=int, default=1,
        help="microbatches per optimizer step: the device batch is split "
             "into N strided chunks (identities round-robin; AT pairs move "
             "as units) whose grads combine weighted by valid-slot count "
             "before ONE Adam update + ONE EMA lerp (BN stats thread "
             "sequentially). Memory knob: saved activations scale with "
             "batch/N, so batches whose activations exceed HBM avoid XLA's "
             "auto-remat recompute (measured +30%% ViT-B / +34%% JPM at N=8 "
             "— BENCH.md §transformer-train). N must divide the device "
             "batch (P*K padded to a mesh multiple; the pair count for "
             "paired AT batches). NOTE: BN-neck batch stats are computed "
             "per-microbatch (torch grad-accum semantics)",
    )
    p.add_argument("--resume", action="store_true")
    p.add_argument("--skip_initial_eval", action="store_true")
    p.add_argument(
        "--fault_inject_epoch", type=int, default=0,
        help="fault-injection drill for the crash-resume path: crash (exit "
             "nonzero) after training epoch N but BEFORE its crash-resume "
             "checkpoint is written, so a --resume (or cli.supervise) must "
             "re-train it; fires only on non-resumed runs so the recovered "
             "run completes. 0 disables",
    )
    p.add_argument(
        "--fault_inject_rank", type=int, default=-1,
        help="with --fault_inject_epoch on a multi-host run: SIGKILL only "
             "this process index (a hard kill — no Python/orbax cleanup), "
             "leaving the other ranks to be torn down by the supervisor "
             "(cli.supervise --multihost). -1 = every rank raises (the "
             "single-host drill)",
    )
    p.add_argument(
        "--num_classes", type=int, default=0,
        help="classifier head size for classifier/JPM models; -1 = #train ids",
    )
    p.add_argument(
        "--id_loss_type", type=str, default="softmax",
        choices=["softmax", "arcface", "cosface", "amsoftmax", "circle"],
        help="ID-loss head (make_models.py:260-277 equivalents)",
    )
    p.add_argument(
        "--cosine_scale", type=float, default=None,
        help="margin-head scale s (cfg.SOLVER.COSINE_SCALE; default per head)",
    )
    p.add_argument(
        "--cosine_margin", type=float, default=None,
        help="margin-head margin m (cfg.SOLVER.COSINE_MARGIN; default per head)",
    )
    p.add_argument(
        "--sie_cameras", type=int, default=0,
        help="SIE camera-embedding table for TransReID backbones; "
             "-1 = one entry per training camera (cfg.MODEL.SIE_CAMERA)",
    )
    p.add_argument(
        "--sie_coef", type=float, default=1.5,
        help="SIE embedding scale (sie_xishu, vit_pytorch.py:453,461; "
             "cfg.MODEL.SIE_COE equivalent)",
    )
    p.add_argument(
        "--remat", type=str, default="none", choices=REMAT_MODES,
        help="transformer-family activation checkpointing "
             "(models/vit.REMAT_MODES): 'tuned' saves qkv/attention-out/"
             "norm2 per block, 'full' saves only block boundaries. Measured "
             "SLOWER than the default at the protocol batch (XLA auto-remat "
             "wins; BENCH.md §transformer-train) — an opt-in memory knob "
             "for bigger batches/models; numerically equivalent "
             "(tests/test_models.py)",
    )
    # multi-host (DCN) bootstrap: run the SAME command on every host
    add_multihost_flags(p)
    return p


def config_from_args(args) -> TrainConfig:
    return TrainConfig(
        model_name=args.model_name,
        img_height=args.img_height,
        img_width=args.img_width,
        compute_dtype=args.compute_dtype,
        model_path=args.model_path,
        dataset=args.dataset,
        data_root=args.data_root,
        turbulence_dir=args.turbulence_dir_path,
        kind_of_transform=args.kind_of_transform,
        is_clean_training=args.is_clean_training,
        P=args.P,
        K=args.K,
        lr=args.lr,
        weight_decay=args.weight_decay,
        tau=args.tau,
        beta=args.beta,
        lambda_proxy=args.lambda_proxy,
        num_epochs=args.epochs,
        eval_freq=args.eval_freq,
        ckpt_freq=args.ckpt_freq,
        save_dir=args.path_to_save_models,
        metrics_dir=args.path_to_save_metrics,
        version=args.version,
        extractor_batch=args.extractor_batch,
        mining_quantize=args.mining_quantize,
        mining_calib_batches=args.mining_calib_batches,
        grad_accum=args.grad_accum,
        num_classes=args.num_classes,
        id_loss_type=args.id_loss_type,
        margin_s=args.cosine_scale,
        margin_m=args.cosine_margin,
        sie_cameras=args.sie_cameras,
        sie_coef=args.sie_coef,
        remat=args.remat,
    )


def main(cfg: TrainConfig, resume: bool = False, skip_initial_eval: bool = False, num_iter: int = 1,
         momentum_on_feature_extraction: bool = False, fault_inject_epoch: int = 0,
         fault_inject_rank: int = -1):
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"Devices: {jax.devices()}")
    dtype = getattr(jnp, cfg.compute_dtype)

    # comma-separated datasets merge their training sets with densely
    # renumbered classes (the reference's multi-target class offsetting,
    # evaluate.py:131-174); evaluation uses the first target's query/gallery
    names = [n for n in cfg.dataset.split(",") if n]
    all_splits = [load_dataset(n, root=cfg.data_root) for n in names]
    splits = all_splits[0]
    from daliid_tpu.data.registry import merge_train_tables

    train_table = merge_train_tables([s["train"] for s in all_splits])
    gallery, queries = splits["gallery"], splits["query"]
    print(f"Number of training examples: {len(train_table)} ({train_table.num_ids} ids)")

    turbulence_dir = cfg.turbulence_dir
    if names[0] == "Synthetic" and cfg.kind_of_transform == 1 and not turbulence_dir:
        from daliid_tpu.data.registry import data_root as _dr

        turbulence_dir = os.path.join(_dr(cfg.data_root), "Synthetic", "turbulence")

    num_classes = cfg.num_classes if cfg.num_classes >= 0 else train_table.num_ids
    if cfg.id_loss_type != "softmax" and num_classes == 0:
        raise SystemExit(
            f"--id_loss_type {cfg.id_loss_type} needs a classifier head: "
            "pass --num_classes (-1 = one class per training identity)"
        )
    if cfg.id_loss_type == "softmax" and (cfg.margin_s is not None or cfg.margin_m is not None):
        raise SystemExit(
            "--cosine_scale/--cosine_margin only apply with a margin "
            "--id_loss_type (arcface/cosface/amsoftmax/circle)"
        )
    if cfg.id_loss_type != "softmax" and cfg.model_name not in MARGIN_HEAD_MODELS:
        # every other factory would swallow the kwarg and silently train a
        # plain softmax head — fail loudly instead
        raise SystemExit(
            f"--id_loss_type {cfg.id_loss_type} is only supported by "
            f"{sorted(MARGIN_HEAD_MODELS)} (make_models.py:262-289); "
            f"{cfg.model_name} has no margin head"
        )
    if cfg.sie_cameras and cfg.model_name not in SIE_MODELS:
        raise SystemExit(
            f"--sie_cameras only applies to {sorted(SIE_MODELS)}; "
            f"{cfg.model_name} has no SIE embedding"
        )
    if cfg.sie_coef != 1.5 and not cfg.sie_cameras:
        raise SystemExit(
            "--sie_coef only takes effect with --sie_cameras != 0; "
            "without SIE embeddings the coefficient is unused"
        )
    sie_cameras = (
        cfg.sie_cameras if cfg.sie_cameras >= 0 else int(train_table.camids.max()) + 1
    )
    if sie_cameras:
        # raw dataset camids index the SIE table directly (Market parses
        # 1-based, registry.py); an out-of-range id would silently clamp in
        # XLA's gather and alias two cameras onto one row — validate here
        cam_max = int(train_table.camids.max())
        if cam_max >= sie_cameras:
            raise SystemExit(
                f"--sie_cameras {sie_cameras} is too small: camids in "
                f"{cfg.dataset} run up to {cam_max} and index the table "
                f"directly (1-based datasets need max+1 = {cam_max + 1}; "
                "pass --sie_cameras -1 to size it automatically)"
            )
    if cfg.remat != "none" and cfg.model_name not in REMAT_MODELS:
        raise SystemExit(
            f"--remat only applies to the transformer family "
            f"{sorted(REMAT_MODELS)}; the CNN train step fits HBM at the "
            f"protocol batch (BENCH.md §train-step) — drop the flag for "
            f"{cfg.model_name!r}"
        )
    online, momentum = build_model_pair(
        cfg.model_name, jax.random.key(cfg.seed), img_size=cfg.img_size, dtype=dtype,
        num_classes=num_classes, id_loss_type=cfg.id_loss_type, sie_cameras=sie_cameras,
        sie_coef=cfg.sie_coef,
        margin_s=cfg.margin_s, margin_m=cfg.margin_m, remat=cfg.remat,
    )
    if cfg.model_path:
        from daliid_tpu.train.checkpoint import load_variables

        online.variables = load_variables(cfg.model_path, online.variables)
        momentum.variables = jax.tree.map(jnp.copy, online.variables)
        print(f"Loaded weights from {cfg.model_path}")

    sampler = PKBatchSampler(
        train_table,
        train_table.pids,
        P=cfg.P,
        K=cfg.K,
        kind_of_transform=cfg.kind_of_transform,
        turbulence_dir=turbulence_dir,
        dataset=names[0],
        seed=cfg.seed,
    )
    trainer = Trainer(
        online,
        momentum,
        sampler,
        img_size=cfg.img_size,
        base_lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        tau=cfg.tau,
        beta=cfg.beta,
        lambda_proxy=cfg.lambda_proxy,
        num_epochs=cfg.num_epochs,
        num_proxies=cfg.num_proxies,
        num_iter=num_iter,
        momentum_on_feature_extraction=momentum_on_feature_extraction,
        compute_dtype=dtype,
        seed=cfg.seed,
        extractor_batch=cfg.extractor_batch,
        decode_workers=cfg.decode_workers,
        mining_quantize=cfg.mining_quantize,
        mining_calib_batches=cfg.mining_calib_batches,
        grad_accum=cfg.grad_accum,
    )

    os.makedirs(cfg.metrics_dir, exist_ok=True)
    ckpt = CheckpointManager(cfg.save_dir)
    # crash-resume channel: full state+RNG every ckpt_freq epochs, newest kept
    # (the best-metric manager above only writes on new-best epochs, so alone
    # it would lose every epoch trained since the last best)
    latest_ckpt = (
        CheckpointManager(os.path.join(cfg.save_dir, "latest"), max_to_keep=1, track_best=False)
        if cfg.ckpt_freq > 0 else None
    )
    start_epoch = 1
    best_r1, best_iter = 0.0, 0
    if resume:
        candidates = [
            (mgr.latest_step(), mgr)
            for mgr in (ckpt, latest_ckpt)
            if mgr is not None and mgr.latest_step() is not None
        ]
        if candidates:
            step, mgr = max(candidates, key=lambda c: c[0])
            trainer.state, last_epoch, rng = mgr.restore(
                epoch=step, template_state=trainer.state
            )
            if rng is not None:
                # replay the continuous run's random stream exactly
                # (tests/test_checkpoint.py::test_resume_equivalence)
                trainer.set_rng_state(rng)
            start_epoch = last_epoch + 1
            # carry the best-R1 watermark across the restart so the resumed
            # run cannot demote the retained best checkpoint
            best = ckpt.best_step()
            if best is not None:
                best_r1 = float(ckpt.metrics(best).get("rank1", 0.0))
                best_iter = int(best)
            print(f"Resumed from epoch {last_epoch} (best rank1 {best_r1:.4f} @ {best_iter})")

    validator = get_validator(names[0], img_size=cfg.img_size, batch_size=cfg.extractor_batch)
    if not skip_initial_eval:
        # pre-training sanity eval (mainKIT.py:87)
        trainer.extractor.update_variables(trainer.online_variables())
        validator.validate(queries, gallery, trainer.extractor, verbose=True)

    progress = []
    t0_pipeline = time.time()
    for epoch in range(start_epoch, cfg.num_epochs + 1):
        print(f"###============ Iteration number {epoch}/{cfg.num_epochs} ============###")
        means = trainer.train_epoch(epoch, verbose=True)
        print(
            f"epoch {epoch}: loss={means.get('loss', 0):.5f} "
            f"center={means.get('center_loss', 0):.5f} proxy={means.get('proxy_loss', 0):.5f} "
            f"acc_bal={means.get('batch_acc_bal', 0):.3f} lr={means['lr']:g} "
            f"({means['epoch_seconds']:.1f}s)"
        )

        if epoch % cfg.eval_freq == 0:
            trainer.extractor.update_variables(trainer.online_variables())
            cmc, mAP, _ = validator.validate(queries, gallery, trainer.extractor, verbose=True)
            trainer.extractor.update_variables(trainer.momentum_variables())
            cmc_m, mAP_m, _ = validator.validate(queries, gallery, trainer.extractor, verbose=True)

            if names[0] == "MSMT17" and "val" in splits:
                trainer.extractor.update_variables(trainer.online_variables())
                msmt17_balanced_accuracy(train_table, splits["val"], trainer.extractor)

            r1 = float(max(cmc[0], cmc_m[0]))
            if r1 > best_r1:
                best_r1, best_iter = r1, epoch
                # orbax save is a collective — every process participates;
                # the plain-file npz/json twins are process-0-only (on a
                # shared filesystem concurrent writers would race)
                ckpt.save(epoch, trainer.state, metrics={"rank1": r1, "mAP": float(mAP)},
                          rng=trainer.rng_state())
                if jax.process_index() == 0:
                    save_variables(
                        os.path.join(cfg.save_dir, f"model_online_{cfg.model_name}_{cfg.version}.npz"),
                        trainer.online_variables(),
                    )
                    save_variables(
                        os.path.join(cfg.save_dir, f"model_momentum_{cfg.model_name}_{cfg.version}.npz"),
                        trainer.momentum_variables(),
                    )
            progress.append(
                {"epoch": epoch, "rank1": float(cmc[0]), "mAP": float(mAP),
                 "rank1_momentum": float(cmc_m[0]), "mAP_momentum": float(mAP_m), **{
                     k: float(v) for k, v in means.items()}}
            )
            if jax.process_index() == 0:
                with open(
                    os.path.join(cfg.metrics_dir, f"progress_{cfg.model_name}_{cfg.version}.json"), "w"
                ) as f:
                    json.dump(progress, f, indent=2)
            print(f"Best R1: {best_r1 * 100:.2f} and best iter: {best_iter}")

        if fault_inject_epoch and epoch == fault_inject_epoch and not resume:
            # drill hook for cli/supervise.py: die before this epoch's
            # crash-resume save lands, so recovery must re-train it
            if fault_inject_rank < 0 or jax.process_index() == fault_inject_rank:
                if fault_inject_rank >= 0:
                    # multi-host drill: hard-kill ONE rank (no Python/orbax
                    # cleanup — the surviving ranks block in their next
                    # collective until the supervisor tears the gang down)
                    import signal

                    print(
                        f"fault injection: SIGKILL rank {jax.process_index()} "
                        f"after epoch {epoch} (--fault_inject_rank)",
                        flush=True,
                    )
                    os.kill(os.getpid(), signal.SIGKILL)
                raise RuntimeError(
                    f"fault injection: simulated crash after epoch {epoch} "
                    f"(--fault_inject_epoch)"
                )

        if latest_ckpt is not None and epoch % cfg.ckpt_freq == 0:
            # wait=True: this is the durability channel — an async save that
            # hasn't finalized is lost to a crash (supervise drill finding)
            latest_ckpt.save(epoch, trainer.state, rng=trainer.rng_state(), wait=True)

    total = time.time() - t0_pipeline
    # phase totals (the reference's accounting prints, mainKIT.py:193-201)
    print(trainer.timer.report())
    print(f"Total pipeline Time: {total:.1f}s ({total / max(cfg.num_epochs - start_epoch + 1, 1):.1f}s/epoch)")
    ckpt.close()
    if latest_ckpt is not None:
        latest_ckpt.close()
    return best_r1, best_iter


if __name__ == "__main__":
    args = build_argparser().parse_args()
    maybe_initialize_from_args(args)
    main(config_from_args(args), resume=args.resume, skip_initial_eval=args.skip_initial_eval,
         num_iter=args.num_iter,
         momentum_on_feature_extraction=bool(args.momentum_on_feature_extraction),
         fault_inject_epoch=args.fault_inject_epoch,
         fault_inject_rank=args.fault_inject_rank)
