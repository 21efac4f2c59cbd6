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
    restored, epoch, rng = mgr.restore(template_state=_tiny_state(seed=1))
    assert epoch == 3
    assert rng is None  # no RNG was captured at save time
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)
    mgr.close()


def test_orbax_rng_roundtrip(tmp_path):
    state = _tiny_state()
    rng_in = {
        "key": np.asarray(jax.random.key_data(jax.random.key(7))),
        "trainer": np.arange(6, dtype=np.uint64),
        "sampler": np.arange(10, 16, dtype=np.uint64),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metrics={"rank1": 0.5}, rng=rng_in)
    _, _, rng_out = mgr.restore(template_state=_tiny_state(seed=1))
    assert set(rng_out) == set(rng_in)
    for k in rng_in:
        assert np.array_equal(np.asarray(rng_out[k]), rng_in[k]), k
    mgr.close()


def test_restore_pre_rng_checkpoint(tmp_path):
    """Checkpoints written before the RNG payload existed (no 'rng' subtree)
    must still restore — orbax's StandardRestore rejects template/disk
    structure mismatches, so restore() retries with the legacy template."""
    import orbax.checkpoint as ocp

    from daliid_tpu.train.checkpoint import _state_to_pytree

    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    legacy_payload = {  # exactly what the pre-round-3 save() wrote
        "state": _state_to_pytree(state),
        "epoch": np.asarray(4, dtype=np.int64),
    }
    mgr._mgr.save(4, args=ocp.args.StandardSave(legacy_payload), metrics={"rank1": 0.2})
    restored, epoch, rng = mgr.restore(template_state=_tiny_state(seed=1))
    assert epoch == 4
    assert rng is None
    assert _tree_equal(restored.params, state.params)
    mgr.close()


def test_orbax_best_and_latest(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    mgr.save(1, state, metrics={"rank1": 0.4})
    mgr.save(2, state, metrics={"rank1": 0.9})
    mgr.save(3, state, metrics={"rank1": 0.6})
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2
    assert mgr.metrics(2).get("rank1") == pytest.approx(0.9)
    mgr.close()


def test_pcg64_state_roundtrip():
    from daliid_tpu.train.trainer import _decode_pcg64, _encode_pcg64

    gen = np.random.default_rng(123)
    gen.standard_normal(17)      # advance, leaving a buffered uint32
    gen.integers(0, 10, size=3)
    clone = _decode_pcg64(_encode_pcg64(gen))
    assert np.array_equal(clone.integers(0, 1 << 62, size=8), gen.integers(0, 1 << 62, size=8))
    assert np.array_equal(clone.standard_normal(5), gen.standard_normal(5))


def test_restore_without_checkpoints_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()


def _resume_trainer(synth_splits, turb):
    """A fresh tiny trainer over the synthetic set (fixed seeds throughout)."""
    from daliid_tpu.train.sampler import PKBatchSampler
    from daliid_tpu.train.trainer import Trainer

    t = synth_splits["train"]
    m = ViTReID(img_size=IMG, patch_size=8, patch_stride=8, embed_dim=32, depth=1, num_heads=2,
                drop_path_rate=0.0)
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    online = ModelBundle(module=m, variables=v, feature_dim=32, name="tiny")
    momentum = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=32,
                           name="tiny")
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=1, turbulence_dir=turb,
                             seed=5)
    return Trainer(online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
                   compute_dtype=jnp.float32, extractor_batch=16, beta=0.9, seed=5)


def test_resume_equivalence(tmp_path):
    """save → fresh process-equivalent Trainer → restore → continue must
    reproduce the continuous run bit-for-bit: model/EMA/optimizer state AND
    the host RNG streams (augmentation keys, mining draws, sampler shuffles)
    all round-trip. The reference cannot make this guarantee — it persists
    only best-metric ``state_dict`` snapshots (``Person-ReID/mainKIT.py:165-170``)."""
    from daliid_tpu.data import make_synthetic_dataset

    splits, turb = make_synthetic_dataset(
        str(tmp_path / "data"), num_ids=6, imgs_per_id_train=4, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1], with_turbulence=True,
    )

    continuous = _resume_trainer(splits, turb)
    cont_losses = [continuous.train_epoch(e)["loss"] for e in (1, 2, 3)]

    first = _resume_trainer(splits, turb)
    first_losses = [first.train_epoch(e)["loss"] for e in (1, 2)]
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, first.state, metrics={"rank1": 0.1}, rng=first.rng_state())

    resumed = _resume_trainer(splits, turb)  # stands in for a fresh process
    resumed.state, last_epoch, rng = mgr.restore(template_state=resumed.state)
    assert last_epoch == 2 and rng is not None
    resumed.set_rng_state(rng)
    resumed_loss3 = resumed.train_epoch(3)["loss"]
    mgr.close()

    # same-process determinism baseline, then the actual resume guarantee
    assert first_losses == cont_losses[:2]
    assert resumed_loss3 == cont_losses[2]
    for name in ("params", "momentum_params", "batch_stats", "opt_state"):
        a = jax.device_get(getattr(continuous.state, name))
        b = jax.device_get(getattr(resumed.state, name))
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name
    # the RNG streams themselves advanced identically
    cont_rng, res_rng = continuous.rng_state(), resumed.rng_state()
    for k in cont_rng:
        assert np.array_equal(cont_rng[k], res_rng[k]), k


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
