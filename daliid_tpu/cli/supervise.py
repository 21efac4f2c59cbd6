"""Training supervisor: failure detection + automatic crash-resume.

The reference has no failure story — a crash loses the run except for the
last best-metric checkpoint (SURVEY.md §5: "Failure detection / elastic
recovery: none"). Here the crash-resume channel (``cli/train.py
--ckpt_freq``, full TrainState + host RNG every epoch) already makes any
interrupted run bit-exactly continuable; this wrapper closes the loop by
*detecting* the failure and relaunching automatically:

    python -m daliid_tpu supervise [--max_restarts 3] -- \
        --dataset Market --model_name resnet50 ...

Everything after ``--`` is the exact ``cli/train.py`` argv. On a nonzero
exit the trainer is relaunched with ``--resume`` (picking up the newest of
the best/latest checkpoint channels, RNG streams included, so the stitched
run is bit-identical to an uninterrupted one —
tests/test_checkpoint.py::test_resume_equivalence).

Failure *budgeting* is progress-aware, like production job managers: the
restart counter resets whenever a relaunch advances the newest checkpoint
epoch, so a long run survives any number of sporadic faults, while a
deterministic crash loop (no forward progress between failures) stops
after ``--max_restarts`` consecutive futile restarts instead of burning
the fleet. ``cli/train.py --fault_inject_epoch`` provides the matching
fault-injection hook for drills.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="DaliID-TPU training supervisor (auto crash-resume)",
        usage="python -m daliid_tpu.cli.supervise [options] -- <cli.train args>",
    )
    p.add_argument(
        "--max_restarts", type=int, default=3,
        help="consecutive restarts WITHOUT checkpoint progress before giving "
             "up (the counter resets every time a restart advances the newest "
             "checkpoint epoch)",
    )
    p.add_argument(
        "--backoff_seconds", type=float, default=2.0,
        help="sleep base between restarts (linear in the consecutive-failure "
             "count)",
    )
    p.add_argument(
        "train_args", nargs=argparse.REMAINDER,
        help="'--' followed by the full cli.train argv",
    )
    return p


def _latest_step(save_dir: str) -> int:
    """Newest checkpoint epoch across the best and latest channels; -1 when
    no checkpoint exists yet."""
    newest = -1
    for d in (save_dir, os.path.join(save_dir, "latest")):
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            if name.isdigit() and os.path.isdir(os.path.join(d, name)):
                newest = max(newest, int(name))
    return newest


def main(args) -> int:
    train_args = list(args.train_args)
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    if not train_args:
        raise SystemExit("no train args given — usage: supervise [options] -- <cli.train args>")

    # parse the pass-through argv with the trainer's own parser so the
    # checkpoint location (and --ckpt_freq sanity) can't drift from train.py
    from daliid_tpu.cli.train import build_argparser as train_argparser

    targs = train_argparser().parse_args(train_args)
    if targs.ckpt_freq <= 0:
        raise SystemExit(
            "supervise requires the crash-resume channel: do not pass --ckpt_freq 0"
        )
    save_dir = targs.path_to_save_models

    failures_without_progress = 0
    attempt = 0
    while True:
        attempt += 1
        argv = list(train_args)
        if attempt > 1 and "--resume" not in argv:
            argv.append("--resume")
        step_before = _latest_step(save_dir)
        cmd = [sys.executable, "-m", "daliid_tpu.cli.train", *argv]
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            print(f"[supervise] training completed after {attempt} attempt(s)")
            return 0
        step_after = _latest_step(save_dir)
        if step_after > step_before:
            failures_without_progress = 0  # the run moved forward: budget resets
        else:
            failures_without_progress += 1
        print(
            f"[supervise] trainer exited rc={rc} (checkpoint epoch "
            f"{step_before} -> {step_after}; "
            f"{failures_without_progress} consecutive failure(s) without progress)",
            flush=True,
        )
        if failures_without_progress > args.max_restarts:
            print(
                f"[supervise] no progress across {args.max_restarts} restarts — giving up",
                file=sys.stderr,
            )
            return rc
        time.sleep(args.backoff_seconds * failures_without_progress)


if __name__ == "__main__":
    raise SystemExit(main(build_argparser().parse_args()))
