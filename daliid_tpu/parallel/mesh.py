"""Device mesh + sharding helpers — the TPU replacement for DataParallel.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate module, scatter batch, gather outputs — every model build,
``Person-ReID/Encoders.py:39-40``; inventory in SURVEY.md §2.3). The
TPU-native equivalent: one ``Mesh`` over all chips with a ``data`` axis,
parameters replicated, batches sharded on axis 0. Gradient all-reduce is
implicit in sharded autodiff; collectives ride ICI. Multi-host extends the
same program via ``jax.distributed.initialize`` (DCN between hosts).

Models here are small (≤ ViT-B), so tensor/pipeline/sequence/expert axes are
deliberately absent — matching the reference's scope (SURVEY.md §2.3, §5) —
but the mesh helpers accept extra axes so a ``model`` axis can be added
without touching call sites.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",), devices=None) -> Mesh:
    """A 1-D (or trivially-extended) mesh over all local devices."""
    devices = devices if devices is not None else jax.devices()
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 over the data axis (DataParallel's scatter)."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (DataParallel's module replication)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``axis`` up to a multiple (XLA static shapes + even sharding).
    Returns (padded, original_length)."""
    n = array.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return array, n
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, pad)
    return np.pad(array, widths), n


def shard_batch(mesh: Mesh, array, axis: str = "data"):
    """Device-put a host batch sharded on axis 0 over the mesh."""
    return jax.device_put(array, batch_sharding(mesh, axis))


def put_global(array, sharding: NamedSharding):
    """Device-put host data under a sharding that may span processes.

    Single-process: a plain ``device_put``. Multi-process (the mesh covers
    other hosts' devices): every process must hold the SAME full global
    array (the data pipeline is deterministic — seeded samplers, shared
    file lists), and each contributes only its addressable shards via
    ``make_array_from_callback``.
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)

    def put_leaf(leaf):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree.map(put_leaf, array)


def fetch_global(x):
    """Bring a (possibly cross-process sharded) array tree back to host
    numpy on every process — the gather leg of DataParallel. Works on
    pytrees (multi-head extractors return tuples)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, x)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda f: np.asarray(multihost_utils.process_allgather(f, tiled=True)), x
    )
