"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the reference never
had multi-node tests at all — SURVEY.md §4); real-TPU benchmarking happens
only through bench.py.

This environment's sitecustomize registers a TPU (axon) PJRT plugin at
interpreter startup and latches ``JAX_PLATFORMS=axon``, so plain env vars
set here are ignored. Backends are still *lazily initialized*, so switching
via ``jax.config.update`` before any device use works — as long as this
conftest runs before anything touches ``jax.devices()``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    # DALIID_TEST_SEED enables multi-seed soak runs of the randomized parity
    # tests (default = the reference's own fixed seed, mainKIT.py:48)
    return np.random.default_rng(int(os.environ.get("DALIID_TEST_SEED", "12")))
