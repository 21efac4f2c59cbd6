"""Checkpoint/resume: orbax round-trip, weights-only npz, best-step tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from daliid_tpu.models.factory import ModelBundle
from daliid_tpu.models.vit import ViTReID
from daliid_tpu.train.checkpoint import (
    CheckpointManager,
    load_variables,
    save_variables,
)
from daliid_tpu.train.trainer import TrainState, make_optimizer

IMG = (32, 16)


def _tiny_state(seed=0):
    m = ViTReID(img_size=IMG, patch_size=8, patch_stride=8, embed_dim=32, depth=1, num_heads=2,
                drop_path_rate=0.0)
    v = m.init({"params": jax.random.key(seed)}, jnp.zeros((1, *IMG, 3)), train=False)
    opt = make_optimizer(1e-3, 1e-4)
    return TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=opt.init(v["params"]),
        momentum_params=jax.tree.map(jnp.copy, v["params"]),
        momentum_batch_stats=jax.tree.map(jnp.copy, v["batch_stats"]),
    )


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_orbax_roundtrip(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, metrics={"rank1": 0.5})
    restored, epoch = mgr.restore(template_state=_tiny_state(seed=1))
    assert epoch == 3
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)
    mgr.close()


def test_orbax_best_and_latest(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    mgr.save(1, state, metrics={"rank1": 0.4})
    mgr.save(2, state, metrics={"rank1": 0.9})
    mgr.save(3, state, metrics={"rank1": 0.6})
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2
    mgr.close()


def test_restore_without_checkpoints_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()


def test_npz_weights_roundtrip(tmp_path):
    state = _tiny_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "w.npz")
    save_variables(path, variables)
    other = _tiny_state(seed=9)
    loaded = load_variables(path, {"params": other.params, "batch_stats": other.batch_stats})
    assert _tree_equal(loaded, variables)


def test_npz_shape_mismatch_raises(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "w.npz")
    save_variables(path, {"params": state.params})
    bad_template = jax.tree.map(lambda x: np.zeros(x.shape + (1,)), {"params": state.params})
    with pytest.raises(ValueError):
        load_variables(path, bad_template)
