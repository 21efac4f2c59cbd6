"""CMC/mAP ranking kernel: jax-vs-numpy-vs-C++ parity + hand-checked cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.metrics import (
    cosine_distance_matrix,
    evaluate_rank,
    evaluate_rank_jax,
    evaluate_rank_numpy,
    evaluate_rank_sharded,
)
from daliid_tpu.metrics.cpp_ref import evaluate_rank_cpp


def _random_problem(rng, num_q=37, num_g=211, num_ids=12, num_cams=4):
    distmat = rng.random((num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, num_ids, num_q)
    g_pids = rng.integers(0, num_ids, num_g)
    q_camids = rng.integers(0, num_cams, num_q)
    g_camids = rng.integers(0, num_cams, num_g)
    return distmat, q_pids, g_pids, q_camids, g_camids


def test_hand_computed_single_query():
    # 1 query (pid 0, cam 0); gallery: [junk(same pid+cam), match, distractor, match]
    distmat = np.array([[0.1, 0.2, 0.3, 0.4]], dtype=np.float32)
    q_pids, q_camids = np.array([0]), np.array([0])
    g_pids = np.array([0, 0, 1, 0])
    g_camids = np.array([0, 1, 0, 1])
    # After junk removal, kept order = [match, distractor, match]
    # CMC = [1,1,1,...]; AP = (1/1 + 2/3) / 2 = 5/6
    cmc, mAP = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=3)
    assert np.allclose(cmc, [1.0, 1.0, 1.0])
    assert mAP == pytest.approx(5.0 / 6.0)

    cmc_j, mAP_j = evaluate_rank_jax(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=3,
    )
    assert np.allclose(np.asarray(cmc_j), cmc)
    assert float(mAP_j) == pytest.approx(mAP, abs=1e-6)


def test_hand_computed_rank2_first_match():
    # Closest kept entry is a distractor; match arrives at rank 2.
    distmat = np.array([[0.1, 0.2]], dtype=np.float32)
    g_pids = np.array([1, 0])
    g_camids = np.array([0, 1])
    cmc, mAP = evaluate_rank_numpy(distmat, np.array([0]), g_pids, np.array([0]), g_camids, max_rank=2)
    assert np.allclose(cmc, [0.0, 1.0])
    assert mAP == pytest.approx(0.5)


def test_invalid_query_excluded():
    # Query 1 has no valid match (its only same-pid entry shares its camera).
    distmat = np.array([[0.1, 0.2], [0.2, 0.1]], dtype=np.float32)
    q_pids, q_camids = np.array([0, 5]), np.array([0, 2])
    g_pids, g_camids = np.array([0, 5]), np.array([1, 2])
    cmc, mAP = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=2)
    cmc_j, mAP_j = evaluate_rank_jax(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=2,
    )
    # Only query 0 counts: match at rank 1 (its junk entry removed... entry0 pid0 cam1 is kept, match)
    assert np.allclose(cmc, np.asarray(cmc_j))
    assert mAP == pytest.approx(float(mAP_j), abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    distmat, q_pids, g_pids, q_camids, g_camids = _random_problem(rng)
    cmc_n, map_n = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=20)
    cmc_j, map_j = evaluate_rank_jax(
        jnp.asarray(distmat),
        jnp.asarray(q_pids.astype(np.int32)),
        jnp.asarray(g_pids.astype(np.int32)),
        jnp.asarray(q_camids.astype(np.int32)),
        jnp.asarray(g_camids.astype(np.int32)),
        max_rank=20,
        query_chunk=16,  # force multi-chunk path incl. padding
    )
    np.testing.assert_allclose(np.asarray(cmc_j), cmc_n, atol=1e-6)
    assert map_j == pytest.approx(map_n, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 7])
def test_cpp_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    distmat, q_pids, g_pids, q_camids, g_camids = _random_problem(rng, num_q=53, num_g=301)
    cmc_n, map_n = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=15)
    cmc_c, map_c = evaluate_rank_cpp(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=15)
    np.testing.assert_allclose(cmc_c, cmc_n, atol=1e-12)
    assert map_c == pytest.approx(map_n, abs=1e-12)


def test_dispatch_backends_agree(rng):
    distmat, q_pids, g_pids, q_camids, g_camids = _random_problem(rng)
    out = {
        b: evaluate_rank(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10, backend=b)
        for b in ("jax", "numpy", "cpp")
    }
    for b in ("numpy", "cpp"):
        np.testing.assert_allclose(out["jax"][0], out[b][0], atol=1e-6)
        assert out["jax"][1] == pytest.approx(out[b][1], abs=1e-6)


@pytest.mark.parametrize("seed", [0, 5])
def test_sharded_ranking_matches_numpy(seed):
    # end-to-end sharded path (queries split over the 8-device mesh) must
    # match the host reference computed from the same embeddings
    rng = np.random.default_rng(seed)
    num_q, num_g, d = 37, 91, 16  # num_q not divisible by 8 → padding path
    q = rng.normal(size=(num_q, d)).astype(np.float32)
    g = rng.normal(size=(num_g, d)).astype(np.float32)
    q_pids = rng.integers(0, 9, num_q)
    g_pids = rng.integers(0, 9, num_g)
    q_camids = rng.integers(0, 3, num_q)
    g_camids = rng.integers(0, 3, num_g)

    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    distmat = (1.0 - qn @ gn.T).astype(np.float32)
    cmc_n, map_n = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=15)

    cmc_s, map_s = evaluate_rank_sharded(
        q, g, q_pids, g_pids, q_camids, g_camids, max_rank=15
    )
    np.testing.assert_allclose(cmc_s, cmc_n, atol=1e-5)
    assert map_s == pytest.approx(map_n, abs=1e-5)


def test_max_rank_exceeds_gallery():
    # gallery smaller than max_rank: CMC extends with its final value
    distmat = np.array([[0.2, 0.1]], dtype=np.float32)
    q_pids, q_camids = np.array([0]), np.array([0])
    g_pids, g_camids = np.array([1, 0]), np.array([1, 1])
    cmc_n, map_n = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=5)
    cmc_j, map_j = evaluate_rank_jax(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=5,
    )
    np.testing.assert_allclose(np.asarray(cmc_j), cmc_n, atol=1e-6)
    assert map_j == pytest.approx(map_n, abs=1e-6)
    assert cmc_n[-1] == 1.0


def test_cosine_distance_matrix_normalizes():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)) * 3.0
    g = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32)) * 0.1
    d = np.asarray(cosine_distance_matrix(q, g))
    assert d.shape == (4, 5)
    assert np.all(d >= -1e-5) and np.all(d <= 2.0 + 1e-5)
    # self-distance of a vector with itself is 0
    d_self = np.asarray(cosine_distance_matrix(q, q))
    assert np.allclose(np.diag(d_self), 0.0, atol=1e-5)


def test_counting_ranker_tied_positives():
    """Two positives at the same distance must NOT double-count each other's
    rank (regression: strict-less counting gave both the same kept-rank,
    inflating AP above 1)."""
    import jax.numpy as jnp

    from daliid_tpu.metrics.ranking import evaluate_rank_jax, evaluate_rank_numpy

    distmat = np.asarray([[0.1, 0.1, 0.5]], np.float32)
    q_pids, q_camids = np.asarray([7]), np.asarray([0])
    g_pids, g_camids = np.asarray([7, 7, 3]), np.asarray([1, 2, 0])
    cmc_np, map_np = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=3)
    cmc, mAP = evaluate_rank_jax(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=3,
    )
    assert float(mAP) == pytest.approx(map_np) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(cmc), cmc_np)


def test_counting_ranker_tied_distances_fuzz(rng):
    """Quantized distances produce many exact positive/negative ties; the
    counting kernel must match the stable-argsort oracle bit-exactly (the
    protocol breaks ties by gallery index — review fix)."""
    import jax.numpy as jnp

    from daliid_tpu.metrics.ranking import evaluate_rank_jax, evaluate_rank_numpy

    for _ in range(10):
        nq, ng = 13, 57
        distmat = rng.integers(0, 6, size=(nq, ng)).astype(np.float32) / 8.0
        q_pids = rng.integers(0, 5, nq)
        g_pids = rng.integers(0, 5, ng)
        q_camids = rng.integers(0, 3, nq)
        g_camids = rng.integers(0, 3, ng)
        cmc_np, map_np = evaluate_rank_numpy(
            distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
        )
        cmc, mAP = evaluate_rank_jax(
            jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
            jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=10,
        )
        np.testing.assert_allclose(np.asarray(cmc), cmc_np, atol=1e-6)
        assert float(mAP) == pytest.approx(map_np, abs=1e-6)
        cmc_c, map_c = evaluate_rank_cpp(
            distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
        )
        np.testing.assert_allclose(cmc_c, cmc_np, atol=1e-6)
        assert map_c == pytest.approx(map_np, abs=1e-6)


def test_positive_columns_edges():
    """Column-table precompute: absent-pid queries get all -1 (excluded from
    the averages downstream); multiplicity fits the bound; columns ascend."""
    from daliid_tpu.metrics.ranking import max_positives_bound, positive_columns

    g_pids = np.asarray([3, 7, 3, 3, 9])
    q_pids = np.asarray([3, 9, 5])
    P = max_positives_bound(g_pids)
    cols = positive_columns(q_pids, g_pids, P)
    assert cols.shape == (3, P)
    assert cols[0, :3].tolist() == [0, 2, 3] and np.all(cols[0, 3:] == -1)
    assert cols[1, 0] == 4 and np.all(cols[1, 1:] == -1)
    assert np.all(cols[2] == -1)  # pid 5 absent from the gallery
    # empty gallery
    empty = positive_columns(q_pids, np.asarray([], np.int64), 8)
    assert empty.shape == (3, 8) and np.all(empty == -1)


def test_rank_query_pid_absent_from_gallery():
    """A query whose pid never appears in the gallery is excluded from CMC
    and mAP (valid=False), matching the oracle."""
    import jax.numpy as jnp

    from daliid_tpu.metrics.ranking import evaluate_rank_jax, evaluate_rank_numpy

    distmat = np.asarray([[0.2, 0.4], [0.1, 0.3]], np.float32)
    q_pids, q_camids = np.asarray([1, 5]), np.asarray([0, 0])
    g_pids, g_camids = np.asarray([1, 2]), np.asarray([1, 1])
    cmc_np, map_np = evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=2)
    cmc, mAP = evaluate_rank_jax(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=2,
    )
    np.testing.assert_allclose(np.asarray(cmc), cmc_np)
    assert float(mAP) == pytest.approx(map_np) == pytest.approx(1.0)


def test_small_max_positives_override_fails_loudly():
    """An explicit max_positives below a queried pid's gallery multiplicity
    would silently drop positives; it must raise instead (review fix)."""
    import jax.numpy as jnp

    from daliid_tpu.metrics.ranking import evaluate_rank_jax

    distmat = np.random.default_rng(0).random((1, 5)).astype(np.float32)
    with pytest.raises(ValueError, match="max_positives"):
        evaluate_rank_jax(
            jnp.asarray(distmat), np.asarray([0]), np.asarray([0, 0, 0, 0, 1]),
            np.asarray([9]), np.asarray([1]), max_rank=5, max_positives=2,
        )
    # UNreferenced pids may exceed the bound freely (pid 0 has 4 entries but
    # no query asks for it — the reviewer's crash case, now valid)
    cmc, mAP = evaluate_rank_jax(
        jnp.asarray(distmat), np.asarray([1]), np.asarray([0, 0, 0, 0, 1]),
        np.asarray([9]), np.asarray([1, 1, 1, 1, 1]), max_rank=5, max_positives=2,
    )
    assert 0.0 < float(mAP) <= 1.0


def _pallas_counts_rank(distmat, q_pids, g_pids, q_camids, g_camids,
                        max_rank=10, count_all=False, ignore_camera=False,
                        query_chunk=8):
    """Drive the Pallas counting path directly (interpret mode — the CPU
    mesh has no Mosaic) with the same host precompute as evaluate_rank_jax."""
    import jax.numpy as jnp

    from daliid_tpu.metrics.ranking import (
        _evaluate_rank_pallas_counts,
        max_positives_bound,
        positive_columns,
    )

    q_cols = positive_columns(
        np.asarray(q_pids), np.asarray(g_pids), max_positives_bound(g_pids)
    )
    cmc, mAP = _evaluate_rank_pallas_counts(
        jnp.asarray(np.asarray(distmat, np.float32)), jnp.asarray(q_cols),
        jnp.asarray(np.asarray(q_pids, np.int32)),
        jnp.asarray(np.asarray(g_pids, np.int32)),
        jnp.asarray(np.asarray(q_camids, np.int32)),
        jnp.asarray(np.asarray(g_camids, np.int32)),
        max_rank, query_chunk, count_all=count_all,
        ignore_camera=ignore_camera, interpret=True,
    )
    return np.asarray(cmc), float(mAP)


@pytest.mark.parametrize("seed", [3, 7])
def test_pallas_rank_counts_matches_numpy(seed):
    """The Pallas counting kernel path (ops/rank_counts.py) reproduces the
    stable-order protocol exactly — random problems with odd (non-tile)
    shapes so every padding branch is exercised."""
    rng = np.random.default_rng(seed)
    distmat, q_pids, g_pids, q_camids, g_camids = _random_problem(
        rng, num_q=37, num_g=211
    )
    cmc_np, map_np = evaluate_rank_numpy(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    cmc, mAP = _pallas_counts_rank(distmat, q_pids, g_pids, q_camids, g_camids)
    np.testing.assert_allclose(cmc, cmc_np, atol=1e-6)
    assert mAP == pytest.approx(map_np, abs=1e-6)


def test_pallas_rank_counts_tied_distances_fuzz(rng):
    """Bit-exact stable-order tie handling in the kernel: quantized
    distances force many exact ties; parity vs the stable-argsort oracle
    and the XLA counting path, incl. the BRIAR conventions."""
    import jax.numpy as jnp

    for trial in range(6):
        nq, ng = 13, 57
        distmat = rng.integers(0, 6, size=(nq, ng)).astype(np.float32) / 8.0
        q_pids = rng.integers(0, 5, nq)
        g_pids = rng.integers(0, 5, ng)
        q_camids = rng.integers(0, 3, nq)
        g_camids = rng.integers(0, 3, ng)
        cmc_np, map_np = evaluate_rank_numpy(
            distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
        )
        cmc, mAP = _pallas_counts_rank(
            distmat, q_pids, g_pids, q_camids, g_camids
        )
        np.testing.assert_allclose(cmc, cmc_np, atol=1e-6)
        assert mAP == pytest.approx(map_np, abs=1e-6)
        # BRIAR conventions (ignore_camera + count_all) vs the XLA path
        from daliid_tpu.metrics.ranking import evaluate_rank_jax as erj

        cmc_b, map_b = _pallas_counts_rank(
            distmat, q_pids, g_pids, q_camids, g_camids,
            count_all=True, ignore_camera=True,
        )
        cmc_x, map_x = erj(
            jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
            jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=10,
            count_all=True, ignore_camera=True,
        )
        np.testing.assert_allclose(cmc_b, np.asarray(cmc_x), atol=1e-6)
        assert map_b == pytest.approx(float(map_x), abs=1e-6)


def test_sharded_pallas_rank_matches_numpy(rng):
    """The sharded ranking program with the Pallas chunk ranker (the route
    multi-device TPU protocols take) matches the oracle — interpret mode,
    8-device CPU mesh, odd shapes."""
    from daliid_tpu.metrics import ranking as R
    from daliid_tpu.parallel.mesh import make_mesh

    nq, ng, d = 37, 211, 16
    q_fvs = rng.normal(size=(nq, d)).astype(np.float32)
    g_fvs = rng.normal(size=(ng, d)).astype(np.float32)
    q_pids = rng.integers(0, 9, nq)
    g_pids = rng.integers(0, 9, ng)
    q_camids = rng.integers(0, 3, nq)
    g_camids = rng.integers(0, 3, ng)

    mesh = make_mesh()
    # replicate evaluate_rank_sharded's host prep, forcing the pallas route
    qn = q_fvs / (np.linalg.norm(q_fvs, axis=1, keepdims=True) + 1e-12)
    gn = g_fvs / (np.linalg.norm(g_fvs, axis=1, keepdims=True) + 1e-12)
    n_dev = mesh.devices.size
    pad = (-nq) % n_dev
    qn = np.pad(qn, ((0, pad), (0, 0)))
    qp = np.pad(q_pids.astype(np.int32), (0, pad), constant_values=-1)
    qc = np.pad(q_camids.astype(np.int32), (0, pad), constant_values=-1)
    qcols = np.pad(
        R.positive_columns(q_pids, g_pids, R.max_positives_bound(g_pids)),
        ((0, pad), (0, 0)), constant_values=-1,
    )
    fn = R._sharded_rank_fn(mesh, 10, False, 8, use_pallas=True, interpret=True)
    cmc_sum, ap_sum, n_valid = fn(
        qn, qcols, qp, qc, gn, g_pids.astype(np.int32), g_camids.astype(np.int32)
    )
    denom = max(float(n_valid), 1.0)
    cmc = np.asarray(cmc_sum) / denom
    mAP = float(ap_sum) / denom

    distmat = 1.0 - qn[:nq] @ gn.T
    cmc_np, map_np = evaluate_rank_numpy(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    np.testing.assert_allclose(cmc, cmc_np, atol=1e-5)
    assert mAP == pytest.approx(map_np, abs=1e-5)


def test_sharded_multihead_pallas_rank_matches_replicated(rng):
    """The multi-head ensemble sharded program with the Pallas chunk ranker
    (use_pallas=True, interpret) matches the replicated per-head merge —
    both weightings."""
    from daliid_tpu.metrics import ranking as R
    from daliid_tpu.metrics.ranking import evaluate_rank_sharded_multihead
    from daliid_tpu.parallel.mesh import make_mesh

    nq, ng = 21, 67
    q_heads = tuple(rng.normal(size=(nq, d)).astype(np.float32) for d in (8, 12))
    g_heads = tuple(rng.normal(size=(ng, d)).astype(np.float32) for d in (8, 12))
    q_pids = rng.integers(0, 6, nq)
    g_pids = rng.integers(0, 6, ng)
    q_camids = rng.integers(0, 3, nq)
    g_camids = rng.integers(0, 3, ng)

    mesh = make_mesh()
    for weighting in ("mean", "magnitude"):
        # reference: the plain XLA-scan route
        cmc_x, map_x = evaluate_rank_sharded_multihead(
            q_heads, g_heads, q_pids, g_pids, q_camids, g_camids,
            mesh=mesh, max_rank=10, head_weighting=weighting,
        )
        # pallas chunk ranker, forced + interpret (the CPU mesh has no Mosaic)
        fn = R._sharded_rank_multihead_fn(
            mesh, 10, False, 8, (8, 12), weighting,
            use_pallas=True, interpret=True,
        )

        def prep(heads):
            normed, mags = [], []
            for h in heads:
                m = np.linalg.norm(h, axis=1, keepdims=True)
                normed.append(h / (m + 1e-12))
                mags.append(m)
            return np.concatenate(normed, 1), np.concatenate(mags, 1)

        q, qm = prep(q_heads)
        g, gm = prep(g_heads)
        n_dev = mesh.devices.size
        pad = (-nq) % n_dev
        q = np.pad(q, ((0, pad), (0, 0)))
        qm = np.pad(qm, ((0, pad), (0, 0)), constant_values=1.0)
        qp = np.pad(q_pids.astype(np.int32), (0, pad), constant_values=-1)
        qc = np.pad(q_camids.astype(np.int32), (0, pad), constant_values=-1)
        qcols = np.pad(
            R.positive_columns(q_pids, g_pids, R.max_positives_bound(g_pids)),
            ((0, pad), (0, 0)), constant_values=-1,
        )
        cmc_sum, ap_sum, n_valid = fn(
            q, qcols, qp, qc, qm, g, g_pids.astype(np.int32),
            g_camids.astype(np.int32), gm,
        )
        denom = max(float(n_valid), 1.0)
        np.testing.assert_allclose(
            np.asarray(cmc_sum) / denom, np.asarray(cmc_x), atol=1e-5,
            err_msg=weighting,
        )
        assert float(ap_sum) / denom == pytest.approx(float(map_x), abs=1e-5)


def test_pallas_rank_empty_query_set_keeps_cmc_shape():
    """Zero queries must still return a (max_rank,) CMC vector (review
    finding r5: an empty stripe list collapsed np.sum to a 0-d scalar)."""
    cmc, mAP = _pallas_counts_rank(
        np.zeros((0, 40), np.float32), np.zeros(0, np.int64),
        np.arange(5).repeat(8), np.zeros(0, np.int64),
        np.zeros(40, np.int64), max_rank=10,
    )
    assert cmc.shape == (10,)
    assert float(mAP) == 0.0
