"""Two-process jax.distributed smoke test (CPU backend).

Validates the multi-host path (`parallel/distributed.py`) the reference never
had (SURVEY.md §2.3): two OS processes bootstrap through a localhost
coordinator, see each other's devices, and run a cross-process psum over a
global mesh — the DCN analogue of the data-parallel gradient all-reduce.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from daliid_tpu.parallel.distributed import initialize_multihost

info = initialize_multihost(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert info["process_count"] == 2, info
assert info["global_devices"] == 2 * info["local_devices"], info

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.array(jax.devices()), ("data",))
n = len(jax.devices())

def local_sum(x):
    return jax.lax.psum(jnp.sum(x), "data")

f = jax.jit(
    shard_map(local_sum, mesh=mesh, in_specs=P("data"), out_specs=P()),
    out_shardings=NamedSharding(mesh, P()),
)
# global array [0, 1, ..., n-1] sharded one element per device
x = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(n, dtype=np.float32)[idx],
)
total = f(x)
expect = n * (n - 1) / 2
assert float(total) == expect, (float(total), expect)
print(f"proc{{info['process_index']}}: psum over {{n}} devices = {{float(total)}}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    code = _WORKER.format(repo=repo, coord=coord)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU plugin in the workers
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    assert "psum over" in outs[0] and "psum over" in outs[1]


_EXTRACT_WORKER = r"""
import glob, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from daliid_tpu.parallel.distributed import initialize_multihost

initialize_multihost(coordinator_address={coord!r}, num_processes=2,
                     process_id=int(sys.argv[1]))
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np

from daliid_tpu.augment.preprocess import decode_resize, normalize_images
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.models.factory import ModelBundle
from daliid_tpu.models.resnet import ResNet50ReID

root = {root!r}
paths = sorted(glob.glob(os.path.join(root, "query", "*.jpg")))
assert len(paths) >= 5, paths

m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
v = m.init({{"params": jax.random.key(0)}}, jnp.zeros((1, 32, 16, 3)), train=False)
bundle = ModelBundle(module=m, variables=v, feature_dim=2048, name="tiny")

ex = FeatureExtractor(bundle, img_size=(32, 16), batch_size=4, decode_workers=2)
feats = ex.extract(paths)

imgs = np.stack([decode_resize(p, 32, 16) for p in paths])
ref = m.apply(v, normalize_images(jnp.asarray(imgs), dtype=jnp.float32), train=False)
np.testing.assert_allclose(feats, np.asarray(ref), rtol=1e-4, atol=1e-5)
print(f"proc{{jax.process_index()}}: cross-process extraction OK {{feats.shape}}")
"""


@pytest.mark.slow
def test_two_process_feature_extraction(tmp_path):
    """The FULL extraction pipeline across two processes: global data mesh
    over both hosts' devices, per-process shard contribution (put_global),
    cross-process allgather (fetch_global) — outputs must equal an
    unsharded single-device forward bit-for-bit (within float tolerance)."""
    from daliid_tpu.data import make_synthetic_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, num_ids=5, imgs_per_id_train=2, imgs_per_id_test=3,
                           height=32, width=16, with_turbulence=False)
    coord = f"127.0.0.1:{_free_port()}"
    code = _EXTRACT_WORKER.format(repo=repo, coord=coord, root=root)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    assert all("cross-process extraction OK" in o for o in outs)


_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from daliid_tpu.parallel.distributed import initialize_multihost

initialize_multihost(coordinator_address={coord!r}, num_processes=2,
                     process_id=int(sys.argv[1]))
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np

from daliid_tpu.data.registry import parse_market_duke_dir
from daliid_tpu.models.factory import ModelBundle
from daliid_tpu.models.resnet import ResNet50ReID
from daliid_tpu.train.sampler import PKBatchSampler
from daliid_tpu.train.trainer import Trainer

root = {root!r}
train = parse_market_duke_dir(os.path.join(root, "bounding_box_train"))

def bundle(seed):
    m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
    v = m.init({{"params": jax.random.key(seed)}}, jnp.zeros((1, 32, 16, 3)), train=False)
    return ModelBundle(module=m, variables=v, feature_dim=2048, name="tiny")

online = bundle(0)
momentum = ModelBundle(module=online.module,
                       variables=jax.tree.map(jnp.copy, online.variables),
                       feature_dim=2048, name="tiny")
sampler = PKBatchSampler(train, train.pids, P=2, K=2, kind_of_transform=0, seed=0)
trainer = Trainer(online, momentum, sampler, img_size=(32, 16), num_epochs=2,
                  base_lr=1e-3, compute_dtype=jnp.float32, extractor_batch=8,
                  decode_workers=2)
metrics = trainer.train_epoch(1)
assert np.isfinite(metrics["loss"]), metrics
print(f"proc{{jax.process_index()}}: sharded train epoch OK loss={{metrics['loss']:.6f}}")
"""


@pytest.mark.slow
def test_two_process_train_epoch(tmp_path):
    """One full sharded train epoch (mining + augmented steps + EMA) across
    two processes: the mesh spans both hosts' devices, batches are staged
    with per-process shard contribution, and both processes converge to the
    same loss (implicit gradient all-reduce over DCN)."""
    from daliid_tpu.data import make_synthetic_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
                           height=32, width=16, with_turbulence=False)
    coord = f"127.0.0.1:{_free_port()}"
    code = _TRAIN_WORKER.format(repo=repo, coord=coord, root=root)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    losses = [o.split("loss=")[1].split()[0] for o in outs]
    assert losses[0] == losses[1], losses  # same global state on both hosts


_RANK_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from daliid_tpu.parallel.distributed import initialize_multihost

initialize_multihost(coordinator_address={coord!r}, num_processes=2,
                     process_id=int(sys.argv[1]))
assert jax.process_count() == 2

import numpy as np
from jax.sharding import Mesh

from daliid_tpu.metrics.ranking import evaluate_rank_numpy, evaluate_rank_sharded

mesh = Mesh(np.array(jax.devices()), ("data",))  # spans both processes

# identical synthetic embeddings on both processes (same seed)
rng = np.random.default_rng(7)
NQ, NG, D, IDS = 37, 61, 32, 9
def make(n):
    pids = rng.integers(0, IDS, n).astype(np.int32)
    cams = rng.integers(0, 4, n).astype(np.int32)
    fvs = (np.eye(IDS, D)[pids] + 0.8 * rng.normal(size=(n, D))).astype(np.float32)
    return fvs, pids, cams
q_fvs, q_pids, q_cams = make(NQ)
g_fvs, g_pids, g_cams = make(NG)

cmc, mAP = evaluate_rank_sharded(
    q_fvs, g_fvs, q_pids, g_pids, q_cams, g_cams, mesh=mesh, max_rank=10
)

qn = q_fvs / np.linalg.norm(q_fvs, axis=1, keepdims=True)
gn = g_fvs / np.linalg.norm(g_fvs, axis=1, keepdims=True)
cmc_ref, map_ref = evaluate_rank_numpy(
    1.0 - qn @ gn.T, q_pids, g_pids, q_cams, g_cams, max_rank=10
)
np.testing.assert_allclose(cmc, cmc_ref, atol=1e-5)
assert abs(mAP - map_ref) < 1e-5, (mAP, map_ref)
print(f"proc{{jax.process_index()}}: cross-process sharded ranking OK mAP={{mAP:.6f}}")
"""


_SEARCH_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from daliid_tpu.parallel.distributed import initialize_multihost

initialize_multihost(coordinator_address={coord!r}, num_processes=2,
                     process_id=int(sys.argv[1]))
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np
from daliid_tpu.eval.matcher import GalleryIndex

# deterministic: every process holds the same host-side gallery (the
# put_global SPMD contract)
rng = np.random.default_rng(5)
G, D = 103, 32
gallery = rng.normal(size=(G, D)).astype(np.float32)
pids = rng.integers(0, 20, G)
probes = rng.normal(size=(5, D)).astype(np.float32)

def l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)

expected_sets = [set(np.argsort(-(l2n(probes) @ l2n(gallery).T))[qi, :4])
                 for qi in range(5)]

for quantize in (None, "int8"):
    idx = GalleryIndex(gallery, pids, quantize=quantize)  # global 4-dev mesh
    assert idx.mesh.devices.size == 4
    vals, ids, out_pids = idx.search(probes, k=4)
    if quantize is None:
        for qi in range(5):
            assert set(ids[qi]) == expected_sets[qi], (qi, ids[qi])
    # enrollment churn across processes: in-place DUS then capacity growth
    extra = rng.normal(size=(3, D)).astype(np.float32)
    idx.add(extra, np.asarray([100, 101, 102]))
    fresh = GalleryIndex(np.concatenate([gallery, extra]),
                         np.concatenate([pids, [100, 101, 102]]),
                         quantize=quantize)
    v1, i1, _ = idx.search(probes, k=4)
    v2, i2, _ = fresh.search(probes, k=4)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)
print(f"proc{{jax.process_index()}}: cross-process gallery search OK")
"""


@pytest.mark.slow
def test_two_process_gallery_search(tmp_path):
    """The serving index across two OS processes: the gallery shards over
    both hosts' devices (put_global), the shard_map search's all_gather
    rides the simulated DCN, and results (f32 + SQ8, incl. in-place
    enrollment churn) match a fresh single-build index and the numpy
    brute force — galleries larger than one host's HBM serve this way."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    code = _SEARCH_WORKER.format(repo=repo, coord=coord)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    assert all("cross-process gallery search OK" in o for o in outs)


def _drill_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
    return env


@pytest.mark.slow
def test_multihost_failure_drill(tmp_path):
    """The multi-host failure story end to end (SURVEY §5 failure-recovery,
    beyond the reference which has none): a 2-process gang trains under
    cli.supervise --multihost; one rank is SIGKILLed mid-run
    (--fault_inject_rank, a hard kill with no orbax cleanup, so the other
    rank blocks in its next collective); the supervisor detects the death,
    tears down the survivor, and relaunches BOTH ranks with --resume. The
    stitched run must be bit-exact vs an uninterrupted gang — every state
    leaf (params, batch stats, opt state, momentum copies) and the restored
    RNG streams identical at the final epoch."""
    import numpy as np

    from daliid_tpu.data import make_synthetic_dataset

    root = str(tmp_path / "ds")
    market = os.path.join(root, "Market-1501-v15.09.15")
    os.makedirs(market)
    make_synthetic_dataset(market, num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
                           height=32, width=16, with_turbulence=False)

    def supervise(save_dir, *extra):
        argv = [
            sys.executable, "-m", "daliid_tpu.cli.supervise",
            "--multihost", "2", "--max_restarts", "2", "--backoff_seconds", "0",
            "--teardown_grace_seconds", "5", "--",
            "--dataset", "Market", "--data_root", root,
            "--img_height", "32", "--img_width", "16",
            "--model_name", "tiny_vit_smoke", "--epochs", "3",
            "--P", "2", "--K", "2", "--eval_freq", "100", "--ckpt_freq", "1",
            "--kind_of_transform", "0", "--compute_dtype", "float32",
            "--extractor_batch", "16", "--skip_initial_eval",
            "--path_to_save_models", str(tmp_path / save_dir),
            "--path_to_save_metrics", str(tmp_path / f"{save_dir}_metrics"),
            *extra,
        ]
        r = subprocess.run(argv, env=_drill_env(), stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True, timeout=1200)
        return r.returncode, r.stdout

    rc_a, out_a = supervise("ckpt_clean")
    assert rc_a == 0, out_a[-4000:]
    assert "training completed after 1 attempt(s)" in out_a, out_a[-4000:]

    rc_b, out_b = supervise("ckpt_fault", "--fault_inject_epoch", "2",
                            "--fault_inject_rank", "1")
    assert rc_b == 0, out_b[-4000:]
    assert "fault injection: SIGKILL rank 1 after epoch 2" in out_b, out_b[-4000:]
    assert "exited rc=-9" in out_b, out_b[-4000:]          # a real SIGKILL
    assert "[supervise] attempt 2" in out_b, out_b[-4000:]
    # epoch 2's crash-resume save never committed (the kill lands before it,
    # and the survivor's lone save can't pass the orbax barrier)
    assert "Resumed from epoch 1" in out_b, out_b[-4000:]
    assert "training completed after 2 attempt(s)" in out_b, out_b[-4000:]

    # stitched == uninterrupted, bit for bit
    from daliid_tpu.train.checkpoint import CheckpointManager

    def final_state(save_dir):
        mgr = CheckpointManager(str(tmp_path / save_dir / "latest"),
                                max_to_keep=1, track_best=False)
        # host-numpy restore: the checkpoint was written by a 2-process gang
        # whose device ids don't exist in this test process
        state, epoch, rng = mgr.restore_host()
        mgr.close()
        return state, epoch, rng

    state_a, epoch_a, rng_a = final_state("ckpt_clean")
    state_b, epoch_b, rng_b = final_state("ckpt_fault")
    assert epoch_a == epoch_b == 3
    leaves_a = jax_tree_leaves(state_a)
    leaves_b = jax_tree_leaves(state_b)
    assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 0
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert rng_a is not None and rng_b is not None
    for k in rng_a:
        np.testing.assert_array_equal(rng_a[k], rng_b[k])


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


@pytest.mark.slow
def test_two_process_sharded_ranking(tmp_path):
    """evaluate_rank_sharded across two OS processes: each host ranks its
    query shard, CMC/AP merge with a psum riding the (simulated) DCN, and
    the result equals the single-host numpy oracle — the multi-host leg of
    the user-facing sharded eval path (VERDICT r2 item #2)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    code = _RANK_WORKER.format(repo=repo, coord=coord)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    assert all("cross-process sharded ranking OK" in o for o in outs)
