"""TorchBatchNorm vs torch.nn.BatchNorm: train-mode forward + running-stat
update parity (the unbiased-running-var rule flax's BatchNorm lacks).

The reference's models are torch BN throughout (``Person-ReID/Encoders.py``
wrappers over torchvision trunks); its eval path consumes running stats, so
any train-then-eval parity claim needs the exact update rule:
``running_var <- 0.9*running_var + 0.1 * var_batch * n/(n-1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.models.norm import TorchBatchNorm


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    return torch


@pytest.mark.parametrize("shape", [(4, 5, 3, 8), (16, 8)])
def test_train_mode_forward_and_running_stats(torch_mod, rng, shape):
    t = torch_mod
    x = rng.normal(size=shape).astype(np.float32) * 2.0 + 0.5
    features = shape[-1]

    m = TorchBatchNorm(use_running_average=False, momentum=0.9)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    # non-trivial affine params
    scale = rng.normal(size=features).astype(np.float32)
    bias = rng.normal(size=features).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }

    tbn = (t.nn.BatchNorm2d if len(shape) == 4 else t.nn.BatchNorm1d)(features, momentum=0.1)
    with t.no_grad():
        tbn.weight.copy_(t.tensor(scale))
        tbn.bias.copy_(t.tensor(bias))
    tbn.train()

    stats = variables["batch_stats"]
    for _ in range(3):  # several updates so the EMA recursion is exercised
        y, upd = m.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x),
            mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
        xt = t.tensor(x.transpose(0, 3, 1, 2)) if len(shape) == 4 else t.tensor(x)
        yt = tbn(xt).detach().numpy()
        if len(shape) == 4:
            yt = yt.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(y), yt, atol=3e-5)
        x = rng.normal(size=shape).astype(np.float32)  # fresh batch each round

    np.testing.assert_allclose(np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]), tbn.running_var.numpy(), rtol=1e-5)


def test_eval_mode_uses_running_stats(torch_mod, rng):
    t = torch_mod
    features = 6
    x = rng.normal(size=(5, features)).astype(np.float32)
    mean = rng.normal(size=features).astype(np.float32)
    var = rng.uniform(0.5, 2.0, features).astype(np.float32)
    variables = {
        "params": {"scale": jnp.ones(features), "bias": jnp.zeros(features)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    y = TorchBatchNorm(use_running_average=True).apply(variables, jnp.asarray(x))

    tbn = t.nn.BatchNorm1d(features)
    with t.no_grad():
        tbn.running_mean.copy_(t.tensor(mean))
        tbn.running_var.copy_(t.tensor(var))
    tbn.eval()
    np.testing.assert_allclose(np.asarray(y), tbn(t.tensor(x)).detach().numpy(), atol=2e-5)


def test_bf16_input_stats_in_f32(rng):
    """bf16 compute path: stats are f32, output is bf16."""
    x = rng.normal(size=(8, 4, 2, 16)).astype(np.float32)
    m = TorchBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), jnp.asarray(x, jnp.bfloat16))
    y, upd = m.apply(v, jnp.asarray(x, jnp.bfloat16), mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    assert upd["batch_stats"]["mean"].dtype == jnp.float32
    assert upd["batch_stats"]["var"].dtype == jnp.float32
