"""k-reciprocal re-ranking: shape, sanity, and quality-improvement tests."""

import numpy as np
import pytest

from daliid_tpu.eval.rerank import re_ranking
from daliid_tpu.metrics.ranking import evaluate_rank_numpy


def _clustered_problem(rng, num_ids=6, per_q=3, per_g=5, d=16, noise=0.35):
    protos = rng.normal(size=(num_ids, d))
    q, g, q_pids, g_pids = [], [], [], []
    for i in range(num_ids):
        for _ in range(per_q):
            q.append(protos[i] + noise * rng.normal(size=d))
            q_pids.append(i)
        for _ in range(per_g):
            g.append(protos[i] + noise * rng.normal(size=d))
            g_pids.append(i)
    q, g = np.asarray(q, np.float32), np.asarray(g, np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    return q, g, np.asarray(q_pids), np.asarray(g_pids)


def test_rerank_shapes_and_finite(rng):
    q, g, _, _ = _clustered_problem(rng)
    qg = 1 - q @ g.T
    out = re_ranking(qg, 1 - q @ q.T, 1 - g @ g.T, k1=5, k2=3)
    assert out.shape == qg.shape
    assert np.isfinite(out).all()


def test_rerank_does_not_hurt_map(rng):
    # on clustered data re-ranking should preserve or improve mAP
    q, g, q_pids, g_pids = _clustered_problem(rng, noise=0.55)
    qg = (1 - q @ g.T).astype(np.float32)
    q_cams = np.zeros(len(q_pids), np.int64)
    g_cams = np.ones(len(g_pids), np.int64)
    _, map_before = evaluate_rank_numpy(qg, q_pids, g_pids, q_cams, g_cams, max_rank=10)
    out = re_ranking(qg, 1 - q @ q.T, 1 - g @ g.T, k1=6, k2=3)
    _, map_after = evaluate_rank_numpy(out, q_pids, g_pids, q_cams, g_cams, max_rank=10)
    assert map_after >= map_before - 0.02


def test_rerank_lambda_one_recovers_original(rng):
    q, g, _, _ = _clustered_problem(rng, num_ids=3, per_q=2, per_g=3)
    qg = (1 - q @ g.T).astype(np.float32)
    out = re_ranking(qg, 1 - q @ q.T, 1 - g @ g.T, k1=4, k2=2, lambda_value=1.0)
    np.testing.assert_allclose(out, qg, atol=1e-5)
