"""Sharded gallery search: correctness vs brute force on the 8-device mesh."""

import numpy as np
import pytest

from daliid_tpu.eval.matcher import GalleryIndex


def _l2n(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_search_matches_bruteforce(rng):
    G, Q, D, K = 103, 7, 32, 5  # G not divisible by 8 → padding path
    gallery = rng.normal(size=(G, D)).astype(np.float32)
    probes = rng.normal(size=(Q, D)).astype(np.float32)
    idx = GalleryIndex(gallery)
    vals, ids, no_pids = idx.search(probes, k=K)
    assert no_pids is None  # pid-less index: search still works

    sims = _l2n(probes) @ _l2n(gallery).T
    expected = np.argsort(-sims, axis=1)[:, :K]
    for qi in range(Q):
        # same set of top-k indices (ties permitted to reorder)
        assert set(ids[qi]) == set(expected[qi])
        np.testing.assert_allclose(np.sort(vals[qi]), np.sort(sims[qi][expected[qi]]), atol=1e-5)
    # similarities sorted descending
    assert np.all(np.diff(vals, axis=1) <= 1e-7)


def test_search_returns_pids(rng):
    gallery = rng.normal(size=(24, 16)).astype(np.float32)
    pids = rng.integers(0, 5, 24)
    idx = GalleryIndex(gallery, gallery_pids=pids)
    vals, ids, out_pids = idx.search(gallery[:3], k=1)
    # nearest neighbor of a gallery vector is itself
    np.testing.assert_array_equal(ids[:, 0], np.arange(3))
    np.testing.assert_array_equal(out_pids[:, 0], pids[:3])
    assert vals[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_k_clamped_to_gallery(rng):
    gallery = rng.normal(size=(4, 8)).astype(np.float32)
    idx = GalleryIndex(gallery)
    vals, ids, _ = idx.search(gallery[:2], k=100)
    assert vals.shape == (2, 4)


def test_gallery_index_add_remove_save_load(tmp_path, rng):
    """Incremental enrollment: add/remove keep search results consistent with
    a fresh index over the same rows; save/load round-trips."""
    d = 32
    g0 = rng.normal(size=(10, d)).astype(np.float32)
    g1 = rng.normal(size=(6, d)).astype(np.float32)
    pids0 = np.arange(10)
    pids1 = np.arange(100, 106)
    probes = rng.normal(size=(3, d)).astype(np.float32)

    idx = GalleryIndex(g0, pids0)
    idx.add(g1, pids1)
    assert idx.num_gallery == 16
    fresh = GalleryIndex(np.concatenate([g0, g1]), np.concatenate([pids0, pids1]))
    v1, i1, p1 = idx.search(probes, k=5)
    v2, i2, p2 = fresh.search(probes, k=5)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(p1, p2)

    idx.remove(np.arange(10))  # retire the original rows
    assert idx.num_gallery == 6
    only1 = GalleryIndex(g1, pids1)
    v3, i3, p3 = idx.search(probes, k=4)
    v4, i4, p4 = only1.search(probes, k=4)
    np.testing.assert_allclose(v3, v4, rtol=1e-6)
    np.testing.assert_array_equal(p3, p4)

    path = str(tmp_path / "index.npz")
    idx.save(path)
    back = GalleryIndex.load(path)
    v5, i5, p5 = back.search(probes, k=4)
    np.testing.assert_allclose(v5, v3, rtol=1e-6)
    np.testing.assert_array_equal(p5, p3)


def test_pallas_search_kernel_parity(rng, monkeypatch):
    """The fused SQ8 search kernel (ops/search_topk.py, interpret mode on
    the CPU mesh, thresholds shrunk) returns the same retrieval as the XLA
    path — values to fp tolerance (multiply-order differs), same top-k
    sets, identical best match."""
    import daliid_tpu.eval.matcher as matcher_mod
    import daliid_tpu.ops.search_topk as st

    G, Q, D, K = 530, 5, 32, 6  # per-shard 128 on the 8-dev mesh
    gallery = rng.normal(size=(G, D)).astype(np.float32)
    probes = rng.normal(size=(Q, D)).astype(np.float32)
    pids = rng.integers(0, 60, G)

    xla = GalleryIndex(gallery, pids, quantize="int8")
    v_ref, i_ref, _ = xla.search(probes, k=K)

    monkeypatch.setenv("DALIID_SEARCH_PALLAS", "interpret")
    monkeypatch.setattr(matcher_mod, "_PALLAS_MIN_SHARD", 64)
    monkeypatch.setattr(st, "CHUNK", 32)
    pal = GalleryIndex(gallery, pids, quantize="int8")
    v, i, _ = pal.search(probes, k=K)

    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i[:, 0], i_ref[:, 0])
    for qi in range(Q):
        assert set(i[qi]) == set(i_ref[qi])

    # num_real masking: enroll past the padded boundary and stay consistent
    extra = rng.normal(size=(3, D)).astype(np.float32)
    xla.add(extra, np.asarray([900, 901, 902]))
    pal.add(extra, np.asarray([900, 901, 902]))
    v2r, i2r, _ = xla.search(probes, k=K)
    v2, i2, _ = pal.search(probes, k=K)
    np.testing.assert_allclose(v2, v2r, rtol=1e-5, atol=1e-6)
    for qi in range(Q):
        assert set(i2[qi]) == set(i2r[qi])


def test_pallas_search_kernel_multi_tile(rng):
    """Probe tiling (round 4): Q > q_tile runs a (n_chunks, n_q_tiles) grid
    with the whole carry VMEM-resident — parity vs a plain top-k over the
    full similarity matrix, including num_real masking and a Q that is not
    a multiple of the tile."""
    import jax
    import jax.numpy as jnp

    from daliid_tpu.ops.search_topk import sq8_search_topk

    G, Q, D, K = 512, 300, 32, 6
    num_real = 420
    g8 = rng.integers(-127, 128, size=(G, D)).astype(np.int8)
    q8 = rng.integers(-127, 128, size=(Q, D)).astype(np.int8)
    gs = rng.uniform(0.5, 1.5, G).astype(np.float32)

    v, i = sq8_search_topk(
        q8, g8, jnp.asarray(gs), jnp.int32(num_real), K,
        chunk=128, q_tile=128, interpret=True,
    )
    sims = (q8.astype(np.int32) @ g8.astype(np.int32).T).astype(np.float32) * gs
    sims[:, num_real:] = -np.inf
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(sims), K)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_pallas_search_kernel_f32_parity(rng, monkeypatch):
    """f32 storage mode (round 4): the same kernel body over an f32 gallery,
    engaged through GalleryIndex's gate — identical retrieval to the XLA
    path."""
    import daliid_tpu.eval.matcher as matcher_mod
    import daliid_tpu.ops.search_topk as st

    G, Q, D, K = 530, 5, 32, 6
    gallery = rng.normal(size=(G, D)).astype(np.float32)
    probes = rng.normal(size=(Q, D)).astype(np.float32)
    pids = rng.integers(0, 60, G)

    xla = GalleryIndex(gallery, pids)
    v_ref, i_ref, _ = xla.search(probes, k=K)

    monkeypatch.setenv("DALIID_SEARCH_PALLAS", "interpret")
    monkeypatch.setattr(matcher_mod, "_PALLAS_MIN_SHARD", 64)
    monkeypatch.setattr(st, "F32_CHUNK", 32)
    pal = GalleryIndex(gallery, pids)
    v, i, _ = pal.search(probes, k=K)

    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i[:, 0], i_ref[:, 0])
    for qi in range(Q):
        assert set(i[qi]) == set(i_ref[qi])

    # enrollment past the padded boundary stays consistent
    extra = rng.normal(size=(3, D)).astype(np.float32)
    xla.add(extra, np.asarray([900, 901, 902]))
    pal.add(extra, np.asarray([900, 901, 902]))
    v2r, i2r, _ = xla.search(probes, k=K)
    v2, i2, _ = pal.search(probes, k=K)
    np.testing.assert_allclose(v2, v2r, rtol=1e-5, atol=1e-6)
    for qi in range(Q):
        assert set(i2[qi]) == set(i2r[qi])


def test_pallas_search_kernel_rejects_giant_shard():
    """Indices ride an f32 lane inside the kernel — shards >= 2^24 rows must
    raise instead of silently corrupting indices (review finding). Traced
    via eval_shape so the 16M-row gallery is never materialized."""
    import jax

    from daliid_tpu.ops.search_topk import sq8_search_topk

    q = jax.ShapeDtypeStruct((8, 128), np.int8)
    g = jax.ShapeDtypeStruct((1 << 24, 128), np.int8)
    s = jax.ShapeDtypeStruct((1 << 24,), np.float32)
    nr = jax.ShapeDtypeStruct((), np.int32)
    with pytest.raises(ValueError, match="2\\^24"):
        jax.eval_shape(lambda *a: sq8_search_topk(*a, k=4), q, g, s, nr)


def test_serving_rerank_matches_eval_rerank(rng):
    """Single probe + full-gallery depth: the serving shortlist re-rank is
    exactly the batch-eval re_ranking (same algorithm, num_q=1)."""
    from daliid_tpu.eval.rerank import re_ranking

    G, D = 24, 16
    gallery = rng.normal(size=(G, D)).astype(np.float32)
    probe = rng.normal(size=(1, D)).astype(np.float32)
    gn = _l2n(gallery)
    qn = _l2n(probe)

    ref = re_ranking(1.0 - qn @ gn.T, np.zeros((1, 1), np.float32),
                     1.0 - gn @ gn.T, k1=5, k2=3, lambda_value=0.3)[0]

    idx = GalleryIndex(gallery, np.arange(G))
    vals, ids, _ = idx.search(probe, k=G, rerank=True, rerank_depth=G,
                              rerank_k1=5, rerank_k2=3, rerank_lambda=0.3)
    # the shortlist is the whole gallery → same distances, same order
    np.testing.assert_allclose(1.0 - vals[0], np.sort(ref), atol=1e-5)
    np.testing.assert_array_equal(ids[0], np.argsort(ref, kind="stable"))


def test_serving_rerank_identity_data(rng):
    """Re-ranked retrieval keeps the correct identities on margin data, in
    both storage modes (the SQ8 index re-ranks from the exact f32 copy)."""
    D, ids, per = 64, 8, 5
    centers = _l2n(rng.normal(size=(ids, D)).astype(np.float32))
    gallery = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(ids * per, D)
    ).astype(np.float32)
    pids = np.repeat(np.arange(ids), per)
    probes = centers + 0.05 * rng.normal(size=(ids, D)).astype(np.float32)
    for quantize in (None, "int8"):
        idx = GalleryIndex(gallery, pids, quantize=quantize)
        vals, _, out_pids = idx.search(probes, k=per, rerank=True,
                                       rerank_depth=3 * per)
        np.testing.assert_array_equal(out_pids[:, 0], np.arange(ids))
        assert vals.shape == (ids, per)
        assert np.all(np.diff(vals, axis=1) <= 1e-6)  # sorted by rerank dist


def test_failed_add_leaves_index_consistent(rng):
    """A rejected add (wrong feature dim, mismatched pid count) must not
    desynchronize the pid table from the enrolled rows (review finding:
    pids were appended before the row write could fail)."""
    idx = GalleryIndex(rng.normal(size=(10, 32)).astype(np.float32), np.arange(10))
    with pytest.raises(ValueError, match="feature dim"):
        idx.add(rng.normal(size=(2, 16)).astype(np.float32), [100, 101])
    with pytest.raises(ValueError, match="pids for"):
        idx.add(rng.normal(size=(2, 32)).astype(np.float32), [100])
    assert idx.num_gallery == 10 and len(idx.gallery_pids) == 10
    # the index still works: enroll + remove round-trip
    idx.add(rng.normal(size=(2, 32)).astype(np.float32), [100, 101])
    idx.remove([10, 11])
    assert idx.num_gallery == 10 and len(idx.gallery_pids) == 10


def test_in_place_append_and_capacity_growth(rng):
    """Within-capacity adds run the in-place dynamic_update_slice path (no
    rebuild: `_capacity` stays put); overflowing adds rebuild at the next
    power of two. Both stay search-identical to a fresh index at every
    step, in f32 and SQ8 modes."""
    d = 32
    g0 = rng.normal(size=(100, d)).astype(np.float32)
    probes = rng.normal(size=(5, d)).astype(np.float32)
    for quantize in (None, "int8"):
        idx = GalleryIndex(g0, np.arange(100), quantize=quantize)
        cap0 = idx._capacity
        rows = [g0]
        total = 100
        # stream single + small-batch adds well past the original capacity
        step = 0
        while total <= cap0 + 40:
            n_new = 1 + (step % 3)
            f = rng.normal(size=(n_new, d)).astype(np.float32)
            idx.add(f, np.arange(total, total + n_new))
            rows.append(f)
            total += n_new
            step += 1
            if total + 8 <= cap0:
                assert idx._capacity == cap0  # still in-place, no rebuild
        assert idx._capacity > cap0  # the overflow grew the capacity
        fresh = GalleryIndex(
            np.concatenate(rows), np.arange(total), quantize=quantize
        )
        v1, i1, _ = idx.search(probes, k=7)
        v2, i2, _ = fresh.search(probes, k=7)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_array_equal(i1, i2)


def test_multi_head_tuple_embeddings(rng):
    """Multi-head extractor outputs (tuples, eval/features.py:255) enroll
    and search as the feature-concat serving vector — identical to manually
    concatenating before indexing (the concat fusion protocol)."""
    n, d1, d2 = 12, 32, 48
    h1 = rng.normal(size=(n, d1)).astype(np.float32)
    h2 = rng.normal(size=(n, d2)).astype(np.float32)
    probes = (h1[:3] + 0.01, h2[:3] - 0.01)

    idx_tuple = GalleryIndex((h1, h2), np.arange(n))
    idx_concat = GalleryIndex(np.concatenate([h1, h2], axis=1), np.arange(n))
    v1, i1, _ = idx_tuple.search(probes, k=4)
    v2, i2, _ = idx_concat.search(np.concatenate([probes[0], probes[1]], axis=1), k=4)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)

    # churn accepts tuples too
    idx_tuple.add((h1[:2], h2[:2]), np.asarray([100, 101]))
    assert idx_tuple.num_gallery == n + 2


def test_int8_index_matches_f32_retrieval(rng):
    """SQ8 gallery: identical top-k retrieval on identity-margin data and
    cosine scores within the per-row quantization error bound."""
    D, ids, per = 128, 12, 6
    centers = _l2n(rng.normal(size=(ids, D)).astype(np.float32))
    gallery = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(ids * per, D)
    ).astype(np.float32)
    pids = np.repeat(np.arange(ids), per)
    probes = centers + 0.05 * rng.normal(size=(ids, D)).astype(np.float32)

    fp = GalleryIndex(gallery, pids)
    q8 = GalleryIndex(gallery, pids, quantize="int8")
    v_fp, i_fp, p_fp = fp.search(probes, k=per)
    v_q8, i_q8, p_q8 = q8.search(probes, k=per)

    # identity decisions unchanged; scores within the SQ8 error band
    np.testing.assert_array_equal(p_fp[:, 0], p_q8[:, 0])
    np.testing.assert_array_equal(np.sort(i_fp, axis=1), np.sort(i_q8, axis=1))
    np.testing.assert_allclose(v_q8, v_fp, atol=0.02)


def test_int8_index_add_remove_save_load(tmp_path, rng):
    """Enrollment churn re-quantizes from the exact f32 host copy; save/load
    round-trips the quantize mode (and --index_quantize off can override)."""
    d = 64
    g0 = rng.normal(size=(10, d)).astype(np.float32)
    g1 = rng.normal(size=(6, d)).astype(np.float32)
    probes = rng.normal(size=(3, d)).astype(np.float32)
    idx = GalleryIndex(g0, np.arange(10), quantize="int8")
    idx.add(g1, np.arange(100, 106))
    fresh = GalleryIndex(
        np.concatenate([g0, g1]), np.arange(16), quantize="int8"
    )
    v1, i1, _ = idx.search(probes, k=5)
    v2, i2, _ = fresh.search(probes, k=5)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)

    path = str(tmp_path / "index_q8.npz")
    idx.save(path)
    back = GalleryIndex.load(path)
    assert back.quantize == "int8"
    v3, i3, _ = back.search(probes, k=5)
    np.testing.assert_allclose(v3, v1, rtol=1e-6)
    np.testing.assert_array_equal(i3, i1)
    # saved host copy stays exact f32 → forcing quantize off recovers fp
    fp = GalleryIndex.load(path, quantize=None)
    assert fp.quantize is None
    v4, _, _ = fp.search(probes, k=5)
    np.testing.assert_allclose(v4, v1, atol=0.02)


def test_gallery_index_remove_nothing_and_search_fn_stable(rng):
    """remove([]) is a no-op (review fix: float64 empty index array), and
    enrollment reuses one jitted search (no per-add closure rebuild)."""
    idx = GalleryIndex(rng.normal(size=(9, 16)).astype(np.float32), np.arange(9))
    fn_before = idx._search
    idx.remove([])
    assert idx.num_gallery == 9
    idx.add(rng.normal(size=(2, 16)).astype(np.float32), np.asarray([50, 51]))
    assert idx._search is fn_before
