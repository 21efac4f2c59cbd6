"""Checkpoint / resume via orbax — full training state, not weights-only.

The reference only ever saves best-metric ``state_dict`` snapshots of the
online+momentum models (``Person-ReID/mainKIT.py:165-170``) — optimizer
state is never persisted and a crash loses the run (SURVEY.md §5). Here a
checkpoint carries the complete :class:`~daliid_tpu.train.trainer.TrainState`
(params, batch stats, optimizer state, momentum copies) plus the epoch
counter and host RNG state, so training resumes exactly.

Export back to the reference's torch key scheme is available via
:func:`daliid_tpu.models.torch_port.resnet50_reid_to_torch_keys`.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp

from daliid_tpu.train.trainer import TrainState


def _state_to_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "momentum_params": state.momentum_params,
        "momentum_batch_stats": state.momentum_batch_stats,
    }


def _zero_rng() -> Dict[str, np.ndarray]:
    """Fixed-shape placeholder matching :meth:`Trainer.rng_state` (``valid``
    flags whether real RNG state was captured), so every checkpoint shares
    one payload structure and templates always line up."""
    return {
        "valid": np.zeros((), np.uint8),
        "key": np.zeros(2, np.uint32),
        "trainer": np.zeros(6, np.uint64),
        "sampler": np.zeros(6, np.uint64),
    }


class CheckpointManager:
    """Thin orbax wrapper: numbered steps + a retained best-metric step."""

    def __init__(self, directory: str, max_to_keep: int = 3, track_best: bool = True):
        """``track_best=True`` retains the top-``max_to_keep`` steps by rank1
        (deployment snapshots); ``track_best=False`` retains the newest
        ``max_to_keep`` steps regardless of metrics (crash-resume channel)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = dict(max_to_keep=max_to_keep)
        if track_best:
            opts.update(best_fn=lambda m: m.get("rank1", 0.0), best_mode="max")
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**opts)
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        metrics: Dict[str, float] | None = None,
        rng: Dict[str, np.ndarray] | None = None,
        wait: bool = False,
    ):
        """``rng`` is :meth:`Trainer.rng_state` — when provided, a resumed
        run replays the exact random stream of a continuous one.

        ``wait=True`` blocks until the checkpoint is durably committed (the
        atomic rename out of ``.orbax-checkpoint-tmp``). The crash-resume
        channel MUST pass it: orbax's background finalize is not guaranteed
        to run before an abnormal exit, so an async save can survive only as
        an unreadable tmp dir — observed in the cli/supervise.py fault
        drill, where an epoch's save launched ~1.5 s before the injected
        crash was still uncommitted."""
        rng_payload = _zero_rng()
        if rng is not None:
            rng_payload.update({k: np.asarray(v) for k, v in rng.items()})
            rng_payload["valid"] = np.ones((), np.uint8)
        payload = {
            "state": _state_to_pytree(state),
            "epoch": np.asarray(epoch, dtype=np.int64),
            "rng": rng_payload,
        }
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(payload),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        if wait:
            self._mgr.wait_until_finished()
        # else: orbax snapshots the arrays to host synchronously and streams
        # to disk in the background, overlapping the next epoch (fine for
        # best-metric snapshots, whose npz twins are written sync anyway).
        # Readers below wait first.

    def restore(self, epoch: int | None = None, template_state: TrainState | None = None):
        """→ (TrainState, epoch, rng | None). ``epoch=None`` restores the
        latest step; ``rng`` is None when the checkpoint carried no RNG."""
        self._mgr.wait_until_finished()
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template_state is not None:
            template = {
                "state": _state_to_pytree(template_state),
                "epoch": np.asarray(0, dtype=np.int64),
                "rng": _zero_rng(),
            }
            try:
                payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
            except ValueError:
                # Checkpoints written before RNG capture (pre round-3) have
                # no 'rng' subtree and orbax's StandardRestore rejects the
                # structure mismatch — retry with the legacy template so old
                # runs still resume (without RNG replay).
                template.pop("rng")
                payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        else:
            payload = self._mgr.restore(step)
        s = payload["state"]
        state = TrainState(
            params=s["params"],
            batch_stats=s["batch_stats"],
            opt_state=s["opt_state"],
            momentum_params=s["momentum_params"],
            momentum_batch_stats=s["momentum_batch_stats"],
        )
        rng = payload.get("rng")
        if rng is None or not int(rng["valid"]):
            rng = None
        else:
            rng = {k: np.asarray(v) for k, v in rng.items() if k != "valid"}
        return state, int(payload["epoch"]), rng

    def restore_host(self, epoch: int | None = None):
        """→ (state pytree, epoch, rng | None) entirely as host numpy,
        ignoring the saving run's device topology — for inspecting a
        multi-process (pod) checkpoint from an arbitrary process (e.g. the
        multi-host failure drill's bit-exactness audit, or offline export
        tooling). The plain :meth:`restore` maps arrays back onto devices
        and requires a compatible mesh/template."""
        self._mgr.wait_until_finished()
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        payload = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
        rng = payload.get("rng")
        if rng is None or not int(rng["valid"]):
            rng = None
        else:
            rng = {k: np.asarray(v) for k, v in rng.items() if k != "valid"}
        return payload["state"], int(payload["epoch"]), rng

    def metrics(self, step: int) -> Dict[str, float]:
        """Saved eval metrics for ``step`` (empty if none were recorded)."""
        self._mgr.wait_until_finished()
        m = self._mgr.metrics(step)
        return dict(m) if m else {}

    def best_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_variables(path: str, variables) -> None:
    """Weights-only export (the analogue of ``torch.save(state_dict)``,
    ``mainKIT.py:169-170``) as an .npz of flattened paths."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_variables(path: str, template) -> Any:
    """Restore a weights-only .npz into the template's structure."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        if arr.shape != np.shape(v):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(v)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
