"""Weibull MLE, tail fitting, meta-recognition fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.eval.meta_recognition import (
    fit_tail,
    metarec,
    mrfuse,
    weibull_mle,
    wscore,
)


def test_weibull_mle_recovers_parameters(rng):
    # samples from known Weibull(k, lambda): x = lam * (-ln U)^(1/k)
    true_k = np.array([1.5, 3.0, 0.8])
    true_lam = np.array([2.0, 0.5, 4.0])
    u = rng.random((3, 20000))
    data = true_lam[:, None] * (-np.log(u)) ** (1.0 / true_k[:, None])
    k, lam = weibull_mle(jnp.asarray(data.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(k), true_k, rtol=0.05)
    np.testing.assert_allclose(np.asarray(lam), true_lam, rtol=0.05)


def test_fit_tail_and_wscore_monotone(rng):
    data = rng.random((4, 200)).astype(np.float32)
    fit = fit_tail(jnp.asarray(data), tail_size=50, sign=1)
    # CDF confidence must be monotone in the score
    scores = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32)[:, None].repeat(4, 1))
    w = np.asarray(wscore(fit, scores))
    assert w.shape == (11, 4)
    assert np.all(np.diff(w, axis=0) >= -1e-6)
    assert np.all((w >= 0) & (w <= 1))


def test_metarec_weights_shape_and_range(rng):
    sim = rng.random((30, 40)).astype(np.float32)
    w = np.asarray(metarec(jnp.asarray(sim), topk=5))
    assert w.shape == (30, 40)
    assert np.all((w >= 0) & (w <= 1))


def test_mrfuse_prefers_confident_matrix(rng):
    # three similarity matrices; fused must stay within the convex hull
    s1 = rng.random((10, 25)).astype(np.float32)
    s2 = rng.random((10, 25)).astype(np.float32)
    s3 = rng.random((10, 25)).astype(np.float32)
    fused = np.asarray(mrfuse(s1, s2, s3, topk=3))
    lo = np.minimum(np.minimum(s1, s2), s3)
    hi = np.maximum(np.maximum(s1, s2), s3)
    assert np.all(fused >= lo - 1e-5) and np.all(fused <= hi + 1e-5)
