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

Multi-host: ``--multihost N`` makes the supervisor the gang scheduler for
an N-process ``jax.distributed`` run (one coordinator port per attempt,
``--process_id`` injected per rank). Failure semantics follow production
pod managers: the death of ANY rank dooms the gang (the survivors block
in their next collective), so the supervisor tears the remaining ranks
down (SIGTERM, then SIGKILL) and relaunches ALL ranks with ``--resume``
from the newest committed checkpoint — which is bit-exact including RNG
streams, so the stitched run equals an uninterrupted one
(tests/test_distributed.py::test_multihost_failure_drill). The targeted
``cli/train.py --fault_inject_rank`` hook SIGKILLs a single rank for
drills. On real multi-machine deployments run one supervisor per host
with the same flags; the checkpoint directory must be on a shared
filesystem (as on TPU pods).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time


# a gang failure this soon after launch is classified as a coordinator
# bootstrap failure (the _free_port TOCTOU) and retried on a fresh port
# without burning the restart budget — bounded by _MAX_BOOTSTRAP_RETRIES
_BOOTSTRAP_WINDOW_SECONDS = 15.0
_MAX_BOOTSTRAP_RETRIES = 3


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
        "--multihost", type=int, default=0, metavar="N",
        help="gang-schedule N coordinated ranks over jax.distributed "
             "(localhost coordinator; --process_id injected per rank). Any "
             "rank failure tears down the whole gang and relaunches all "
             "ranks with --resume. N=1 runs a 1-rank gang (jax.distributed "
             "bootstrap included); 0 = plain single-process (default)",
    )
    p.add_argument(
        "--teardown_grace_seconds", type=float, default=10.0,
        help="multihost: how long to let surviving ranks exit on their own "
             "after a rank failure before SIGTERM (then SIGKILL after 5 s)",
    )
    p.add_argument(
        "--straggler_timeout", type=float, default=600.0,
        help="multihost liveness watchdog: once ANY rank has exited "
             "(success or failure), the remaining ranks must finish within "
             "this many seconds or the gang is treated as hung (e.g. a "
             "survivor deadlocked in a collective with no dead rank to trip "
             "the failure check) and torn down. 0 disables",
    )
    p.add_argument(
        "train_args", nargs=argparse.REMAINDER,
        help="'--' followed by the full cli.train argv",
    )
    return p


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _teardown(procs, grace_seconds: float) -> None:
    """Let ranks exit on their own for the grace window, then SIGTERM, then
    SIGKILL 5 s later; reaps everything before returning."""
    deadline = time.time() + grace_seconds
    while time.time() < deadline and any(p.poll() is None for p in procs):
        time.sleep(0.2)
    for p in procs:
        if p.poll() is None:
            p.terminate()
    deadline = time.time() + 5.0
    while time.time() < deadline and any(p.poll() is None for p in procs):
        time.sleep(0.2)
    for p in procs:
        if p.poll() is None:
            p.kill()
    for p in procs:
        p.wait()


def _run_gang(train_argv, num_processes: int, grace_seconds: float,
              straggler_timeout: float = 0.0) -> tuple[int, float | None]:
    """One attempt of an N-rank jax.distributed gang. Returns
    ``(rc, fail_elapsed)``: rc 0 only when every rank exits 0; on any rank
    failure the survivors (typically blocked in a collective on the dead
    rank) are torn down — SIGTERM after the grace window, SIGKILL 5 s
    later — and the first failing rank's code is returned.
    ``fail_elapsed`` is the seconds from launch to the FIRST failure
    detection (None on success) — measured before teardown, so the caller's
    bootstrap-failure classification is not skewed by the grace/SIGTERM
    waits or slow interpreter startup of the survivors. A fresh coordinator
    port per attempt avoids TIME_WAIT reuse.

    Liveness watchdog (``straggler_timeout`` > 0): once any rank has exited
    — including rc=0, the no-dead-rank deadlock case where a survivor blocks
    in a collective forever — the rest must finish within the timeout or the
    gang is torn down and reported failed (rc 1)."""
    coord = f"127.0.0.1:{_free_port()}"
    t_launch = time.time()
    procs = []
    for rank in range(num_processes):
        cmd = [
            sys.executable, "-m", "daliid_tpu.cli.train", *train_argv,
            "--multihost", "--coordinator_address", coord,
            "--num_processes", str(num_processes), "--process_id", str(rank),
        ]
        procs.append(subprocess.Popen(cmd))
    print(f"[supervise] gang of {num_processes} ranks launched (coordinator {coord})",
          flush=True)
    first_exit_at: float | None = None
    while True:
        codes = [p.poll() for p in procs]
        if all(c == 0 for c in codes):
            return 0, None
        failed = [(i, c) for i, c in enumerate(codes) if c is not None and c != 0]
        if failed:
            fail_elapsed = time.time() - t_launch
            rank, rc = failed[0]
            alive = [i for i, c in enumerate(codes) if c is None]
            print(
                f"[supervise] rank {rank} exited rc={rc} "
                f"{fail_elapsed:.1f}s after launch"
                + (f" — tearing down surviving rank(s) {alive}" if alive else ""),
                flush=True,
            )
            _teardown(procs, grace_seconds)
            return rc, fail_elapsed
        if any(c is not None for c in codes):
            if first_exit_at is None:
                first_exit_at = time.time()
            elif straggler_timeout > 0 and time.time() - first_exit_at > straggler_timeout:
                alive = [i for i, c in enumerate(codes) if c is None]
                print(
                    f"[supervise] rank(s) {alive} still running "
                    f"{straggler_timeout:.0f}s after the first rank finished — "
                    f"treating the gang as hung and tearing it down",
                    flush=True,
                )
                _teardown(procs, grace_seconds)
                # a hang is never a bootstrap failure
                return 1, None
        time.sleep(0.5)


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
    if args.multihost < 0:
        raise SystemExit(f"--multihost must be >= 0, got {args.multihost}")
    if args.multihost >= 1 and (
        targs.multihost or targs.coordinator_address is not None
        or targs.num_processes is not None or targs.process_id is not None
    ):
        raise SystemExit(
            "supervise --multihost owns the rank bootstrap: do not pass "
            "--multihost/--coordinator_address/--num_processes/--process_id "
            "in the train argv"
        )
    save_dir = targs.path_to_save_models

    failures_without_progress = 0
    bootstrap_retries = 0
    attempt = 0
    while True:
        attempt += 1
        argv = list(train_args)
        if attempt > 1 and "--resume" not in argv:
            argv.append("--resume")
        step_before = _latest_step(save_dir)
        fail_elapsed = None
        if args.multihost >= 1:
            print(
                f"[supervise] attempt {attempt}: {args.multihost}-rank gang of "
                f"daliid_tpu.cli.train {' '.join(argv)}",
                flush=True,
            )
            rc, fail_elapsed = _run_gang(
                argv, args.multihost, args.teardown_grace_seconds,
                args.straggler_timeout,
            )
        else:
            cmd = [sys.executable, "-m", "daliid_tpu.cli.train", *argv]
            print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
            rc = subprocess.call(cmd)
        if rc == 0:
            print(f"[supervise] training completed after {attempt} attempt(s)")
            return 0
        step_after = _latest_step(save_dir)
        if step_after > step_before:
            failures_without_progress = 0  # the run moved forward: budget resets
        elif (
            fail_elapsed is not None
            and fail_elapsed < _BOOTSTRAP_WINDOW_SECONDS
            and bootstrap_retries < _MAX_BOOTSTRAP_RETRIES
        ):
            # a rank that dies within seconds of launch (measured to FIRST
            # failure, before any teardown/grace waits) most likely lost the
            # _free_port() TOCTOU race (another process claimed the probed
            # port before rank 0's coordinator bind): retry on a fresh port
            # WITHOUT burning the restart budget. Bounded, so a
            # deterministically-instant crash (bad flags) still gives up.
            bootstrap_retries += 1
            print(
                f"[supervise] gang failed {fail_elapsed:.1f}s after launch "
                f"(rc={rc}) — treating as a coordinator-bootstrap failure; "
                f"free retry {bootstrap_retries}/{_MAX_BOOTSTRAP_RETRIES} "
                f"on a fresh port",
                flush=True,
            )
            continue
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
