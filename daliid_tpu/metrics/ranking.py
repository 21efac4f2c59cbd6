"""Market-1501-protocol CMC / mAP ranking — on-device (XLA) and host reference.

The reference delegates ranking to torchreid's Cython kernel
(``evaluate_cy``, imported at ``Person-ReID/validateModels.py:16-24`` and
invoked via ``torchreid.metrics.evaluate_rank`` at
``Person-ReID/validateModels.py:68``). That kernel is a per-query host scan:
sort the gallery by distance, drop entries sharing the query's (pid, camid)
("junk" entries under the Market protocol), then accumulate the cumulative
match characteristic and average precision.

Here the whole protocol is a single vectorized XLA program over the
``(num_queries, num_gallery)`` distance matrix — sort-free: each positive's
kept-rank is a masked compare-count over gallery blocks
(:func:`_rank_chunk_counting`), jit-compiled and chunked over queries so
HBM stays bounded (15.6x faster than an argsort formulation at DeepChange
scale, BENCH.md). Ties follow the protocol's stable order — equal distances
rank by gallery index, exactly like the Cython kernel's stable sort — so a
numpy reference (:func:`evaluate_rank_numpy`) and a C++ reference
(:mod:`daliid_tpu.metrics.cpp_ref`) match bit-exactly even on tied
distances (fuzzed in ``tests/test_metrics.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cosine_distance_matrix(query_fvs: jnp.ndarray, gallery_fvs: jnp.ndarray) -> jnp.ndarray:
    """``1 - Q @ G.T`` over L2-normalized embeddings.

    Mirrors ``Person-ReID/validateModels.py:41-47`` (normalize then
    ``1 - mm``). One big MXU matmul; inputs are normalized here so callers
    can pass raw embeddings.
    """
    q = query_fvs / (jnp.linalg.norm(query_fvs, axis=1, keepdims=True) + 1e-12)
    g = gallery_fvs / (jnp.linalg.norm(gallery_fvs, axis=1, keepdims=True) + 1e-12)
    return 1.0 - q @ g.T


def _positive_prologue(dist_chunk, q_cols, q_camids, g_camids, ignore_camera):
    """Shared positive extraction for every counting route: gather each
    query's same-pid gallery columns (``q_cols``, -1 padded), drop the
    query-camera ("junk") ones unless ``ignore_camera`` (BRIAR), and return
    ``(posmask, num_rel, p_dist, p_idx)`` with +inf / int32-max sentinels at
    invalid slots — the stable-order thresholds the counting cores compare
    against. One definition keeps the XLA scan and the Pallas kernel routes
    from drifting."""
    valid_col = q_cols >= 0
    safe = jnp.where(valid_col, q_cols, 0)
    d_cols = jnp.take_along_axis(dist_chunk, safe, axis=1)       # (B, P)
    if ignore_camera:
        posmask = valid_col
    else:
        posmask = valid_col & (g_camids[safe] != q_camids[:, None])
    num_rel = posmask.sum(axis=1)
    p_dist = jnp.where(posmask, d_cols, jnp.inf)
    p_idx = jnp.where(posmask, safe, jnp.iinfo(jnp.int32).max)
    return posmask, num_rel, p_dist, p_idx


def _counts_epilogue(counts, posmask, num_rel, G, max_rank):
    """Shared counts → (cmc_rows, ap, valid) tail: first match = min kept
    count over valid positives; AP ranks positives among themselves with a
    (B, P, P) strict compare (stable-order ranks are unique per query)."""
    big = jnp.int32(G + 1)
    c_valid = jnp.where(posmask, counts, big)
    first = jnp.where(num_rel > 0, jnp.min(c_valid, axis=1), G)
    pos_rank = jnp.sum(
        c_valid[:, None, :] < c_valid[:, :, None], axis=2, dtype=jnp.int32
    )
    precision = (pos_rank.astype(jnp.float32) + 1.0) / (counts.astype(jnp.float32) + 1.0)
    ap = jnp.where(posmask, precision, 0.0).sum(axis=1) / jnp.maximum(num_rel, 1)
    cmc_rows = (first[:, None] <= jnp.arange(max_rank)[None, :]).astype(jnp.float32)
    return cmc_rows, ap.astype(jnp.float32), num_rel > 0


def _rank_chunk_counting(
    dist_chunk: jnp.ndarray,   # (B, G) float
    q_cols: jnp.ndarray,       # (B, P) int32 same-pid gallery columns, -1 pad
    q_pids: jnp.ndarray,       # (B,) int32
    q_camids: jnp.ndarray,     # (B,) int32
    g_pids: jnp.ndarray,       # (G,) int32
    g_camids: jnp.ndarray,     # (G,) int32
    max_rank: int,
    g_block: int = 8192,
    ignore_camera: bool = False,
):
    """Sort-free CMC/AP: the kept-rank of each positive is the COUNT of
    kept gallery entries ranked before it under the protocol's stable order
    (distance, then gallery index) — a masked compare-reduce instead of a
    (B, G) argsort, bit-exact vs the stable-argsort references including on
    tied distances.

    The positives themselves come from ``q_cols`` — the host-precomputed
    same-pid gallery columns per query (:func:`positive_columns`) — so
    extraction is a (B, P) gather rather than an O(G·P) in-kernel ``top_k``
    (which the xprof trace showed costing 2x the counting scan itself).
    Ranks are unique within a query under the stable order, so CMC takes a
    min over slots and AP ranks positives among themselves with a tiny
    (P, P) compare — no sorted-slot assumption anywhere.
    """
    B, G = dist_chunk.shape
    same_pid = g_pids[None, :] == q_pids[:, None]
    if ignore_camera:
        # BRIAR convention (validateModels.py:84-105): nothing is junk and
        # every same-pid gallery image is a positive, whatever its camid
        junk = jnp.zeros_like(same_pid)
    else:
        junk = same_pid & (g_camids[None, :] == q_camids[:, None])

    posmask, num_rel, p, gidx = _positive_prologue(
        dist_chunk, q_cols, q_camids, g_camids, ignore_camera
    )

    pad = (-G) % g_block
    d_p = jnp.pad(dist_chunk, ((0, 0), (0, pad)), constant_values=jnp.inf)
    keep_p = jnp.pad(~junk, ((0, 0), (0, pad)))
    nb = d_p.shape[1] // g_block
    d_b = d_p.reshape(B, nb, g_block).transpose(1, 0, 2)
    k_b = keep_p.reshape(B, nb, g_block).transpose(1, 0, 2)
    idx_b = jnp.arange(d_p.shape[1], dtype=jnp.int32).reshape(nb, g_block)

    def body(carry, blk):
        d_blk, v_blk, i_blk = blk
        # before-in-stable-order: strictly closer, or tied with a smaller
        # gallery index (this also orders tied positives among themselves)
        before = (d_blk[:, :, None] < p[:, None, :]) | (
            (d_blk[:, :, None] == p[:, None, :])
            & (i_blk[None, :, None] < gidx[:, None, :])
        )
        c = jnp.sum(before & v_blk[:, :, None], axis=1, dtype=jnp.int32)
        return carry + c, None

    counts, _ = jax.lax.scan(
        body, jnp.zeros((B, q_cols.shape[1]), jnp.int32), (d_b, k_b, idx_b)
    )
    return _counts_epilogue(counts, posmask, num_rel, G, max_rank)


def _use_pallas_rank() -> bool:
    """Gate for the Pallas counting kernel (``ops/rank_counts.py``): TPU
    backends only; ``DALIID_RANK_PALLAS=0`` reverts to the XLA scan."""
    import os

    if os.environ.get("DALIID_RANK_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# smaller protocols stay on the XLA scan — the kernel's win is the large-
# gallery sweep, and a launch + transpose isn't worth it under this
_PALLAS_RANK_MIN_GALLERY = 16384


def _pallas_gate(num_gallery: int) -> bool:
    """ONE kernel-selection policy for every ranking route (the replicated
    path, the sharded path, and the multi-head sharded path) — a threshold
    tune applied here cannot leave the routes on divergent policies."""
    return _use_pallas_rank() and int(num_gallery) >= _PALLAS_RANK_MIN_GALLERY


# Queries per Pallas dispatch: every protocol size reuses the ONE compiled
# (stripe, G_pad, P_pad) geometry — measured on chip, the 17.5k-query
# full-geometry program takes >12 min of XLA/Mosaic compile while the
# 2048-stripe compiles in ~12 s and pipelines back-to-back
_PALLAS_RANK_STRIPE = 2048


@functools.partial(
    jax.jit,
    static_argnames=("max_rank", "query_chunk", "ignore_camera", "interpret"),
)
def _pallas_rank_stripe(
    distmat, q_cols, q_pids, g_pids, q_camids, g_camids, max_rank,
    query_chunk, ignore_camera=False, interpret=False,
):
    """One query stripe of the Pallas counting path: kernel counts
    (``ops/rank_counts.py``) + the cheap O(B·P²) first-match/AP epilogue.
    Returns UNnormalized (cmc_rows_sum (max_rank,), ap_sum (), n_valid ())
    so stripes combine by addition. Bit-exact vs the XLA scan including
    tied distances (same stable-order compare)."""
    from daliid_tpu.ops.rank_counts import positive_rank_counts

    num_q, G = distmat.shape
    P = q_cols.shape[1]
    q_pids = q_pids.astype(jnp.int32)
    q_camids = q_camids.astype(jnp.int32)
    g_pids = g_pids.astype(jnp.int32)
    g_camids = g_camids.astype(jnp.int32)

    posmask, num_rel, p_dist, p_idx = _positive_prologue(
        distmat, q_cols, q_camids, g_camids, ignore_camera
    )
    counts = positive_rank_counts(
        distmat, p_dist, p_idx, q_pids, q_camids, g_pids, g_camids,
        ignore_camera=ignore_camera, interpret=interpret,
    )

    # shared epilogue, chunked over queries (pos_rank is (chunk, P, P));
    # padded rows carry num_rel 0 → valid False → excluded from every sum
    pad = (-num_q) % query_chunk
    cnt_p = jnp.pad(counts, ((0, pad), (0, 0)))
    pm_p = jnp.pad(posmask, ((0, pad), (0, 0)))
    nr_p = jnp.pad(num_rel, (0, pad))
    n_chunks = cnt_p.shape[0] // query_chunk

    def body(args):
        cnt, pm, nr = args
        cmc_rows, ap, valid = _counts_epilogue(cnt, pm, nr, G, max_rank)
        v = valid.astype(jnp.float32)
        return (
            (cmc_rows * v[:, None]).sum(axis=0),
            (ap * v).sum(),
            v.sum(),
        )

    cmc_c, ap_c, nv_c = jax.lax.map(
        body,
        (
            cnt_p.reshape(n_chunks, query_chunk, P),
            pm_p.reshape(n_chunks, query_chunk, P),
            nr_p.reshape(n_chunks, query_chunk),
        ),
    )
    return cmc_c.sum(axis=0), ap_c.sum(), nv_c.sum()


def _evaluate_rank_pallas_counts(
    distmat, q_cols, q_pids, g_pids, q_camids, g_camids, max_rank,
    query_chunk, count_all=False, ignore_camera=False, interpret=False,
):
    """Pallas counting-rank path: stripes queries at a fixed geometry
    (``_PALLAS_RANK_STRIPE``) so any query-set size runs the one compiled
    kernel; stripe sums combine on the host. Same (cmc, mAP) contract as
    :func:`_evaluate_rank_jax`."""
    num_q = int(distmat.shape[0])
    stripe = min(_PALLAS_RANK_STRIPE, -(-max(num_q, 1) // 128) * 128)
    # device results collect in lists and fetch ONCE after the loop: a
    # per-stripe host sync would serialize stripe dispatch against the
    # host's slice/pad prep (review finding r5)
    parts = []
    for s in range(0, num_q, stripe):
        e = min(s + stripe, num_q)
        pad = stripe - (e - s)
        d = jax.lax.dynamic_slice_in_dim(distmat, s, e - s, axis=0)
        cols = q_cols[s:e]
        qp = q_pids[s:e]
        qc = q_camids[s:e]
        if pad:
            # padded rows: pid -1 / cols -1 → zero positives → valid False
            d = jnp.pad(d, ((0, pad), (0, 0)))
            cols = jnp.pad(cols, ((0, pad), (0, 0)), constant_values=-1)
            qp = jnp.pad(qp, (0, pad), constant_values=-1)
            qc = jnp.pad(qc, (0, pad), constant_values=-1)
        parts.append(_pallas_rank_stripe(
            d, cols, qp, g_pids, qc, g_camids, max_rank,
            min(query_chunk, stripe), ignore_camera=ignore_camera,
            interpret=interpret,
        ))
    parts = jax.device_get(parts)
    # explicit zero init keeps the empty-query-set cmc a (max_rank,) vector
    # (np.sum([], axis=0) collapses to a 0-d scalar — review finding r5)
    cmc_sum = np.zeros(max_rank, np.float64)
    for c, _, _ in parts:
        cmc_sum += np.asarray(c, np.float64)
    ap_sum = float(np.sum([a for _, a, _ in parts])) if parts else 0.0
    n_valid = float(np.sum([v for _, _, v in parts])) if parts else 0.0
    denom = float(num_q) if count_all else max(n_valid, 1.0)
    return jnp.asarray(cmc_sum / max(denom, 1.0), jnp.float32), jnp.float32(
        ap_sum / max(denom, 1.0)
    )


def _rank_chunk_counting_kernel(
    dist_chunk, q_cols, q_pids, q_camids, g_pids, g_camids, max_rank,
    ignore_camera=False, interpret=False,
):
    """Same contract as :func:`_rank_chunk_counting` — (cmc_rows, ap,
    valid) for one query chunk — with the O(B·G·P) counting core in the
    Pallas kernel. Traceable (no host loop), so it runs inside the
    shard_map ranking programs; geometry is the (chunk, G, P) shapes of
    the call site, compiled once per protocol."""
    from daliid_tpu.ops.rank_counts import positive_rank_counts

    G = dist_chunk.shape[1]
    posmask, num_rel, p_dist, p_idx = _positive_prologue(
        dist_chunk, q_cols, q_camids, g_camids, ignore_camera
    )
    counts = positive_rank_counts(
        dist_chunk, p_dist, p_idx, q_pids, q_camids, g_pids, g_camids,
        ignore_camera=ignore_camera, interpret=interpret,
    )
    return _counts_epilogue(counts, posmask, num_rel, G, max_rank)


def _chunk_ranker(use_pallas: bool, interpret: bool, max_rank: int,
                  ignore_camera: bool):
    """Chunk-ranking callable for the sharded programs: the Pallas counting
    kernel on TPU protocols, the XLA scan otherwise (same bit-exact
    contract either way)."""
    if use_pallas:
        return functools.partial(
            _rank_chunk_counting_kernel, max_rank=max_rank,
            ignore_camera=ignore_camera, interpret=interpret,
        )
    return functools.partial(
        _rank_chunk_counting, max_rank=max_rank, ignore_camera=ignore_camera,
    )


def max_positives_bound(g_pids) -> int:
    """Static per-query positive-count bound: the largest gallery pid
    multiplicity (junk filtering only shrinks it). Rounded up to 8 so
    nearby gallery compositions share a compiled executable."""
    gp = np.asarray(g_pids)
    if gp.size == 0:
        return 8
    counts = np.unique(gp, return_counts=True)[1]
    return int(min(gp.size, 8 * np.ceil(counts.max() / 8)))


def positive_columns(q_pids, g_pids, max_positives: int) -> np.ndarray:
    """(num_q, max_positives) int32 table of each query's same-pid gallery
    column indices (ascending), -1 padded; all -1 for queries whose pid is
    absent from the gallery. Host-side precompute that replaces the ranking
    kernel's in-kernel positive extraction — O(G log G) once instead of an
    O(G·P) ``top_k`` per query chunk."""
    qp = np.asarray(q_pids)
    gp = np.asarray(g_pids)
    if gp.size == 0 or qp.size == 0:
        return np.full((qp.shape[0], max_positives), -1, np.int32)
    order = np.argsort(gp, kind="stable")
    uniq, starts, counts = np.unique(gp[order], return_index=True, return_counts=True)
    width = int(counts.max())
    pid_table = np.full((uniq.shape[0], width), -1, np.int32)
    rows = np.repeat(np.arange(uniq.shape[0]), counts)
    slots = np.arange(gp.size) - np.repeat(starts, counts)
    pid_table[rows, slots] = order
    q_row = np.clip(np.searchsorted(uniq, qp), 0, uniq.shape[0] - 1)
    has = uniq[q_row] == qp
    q_mult = np.where(has, counts[q_row], 0)
    if q_mult.size and int(q_mult.max()) > max_positives:
        # truncating here would silently drop positives and miscount ranks
        raise ValueError(
            f"max_positives={max_positives} is below the largest queried-pid "
            f"gallery multiplicity ({int(q_mult.max())}); raise it or use the "
            "default bound"
        )
    out = np.full((qp.shape[0], max_positives), -1, np.int32)
    take = min(width, max_positives)
    out[:, :take] = np.where(has[:, None], pid_table[q_row][:, :take], -1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_rank", "query_chunk", "g_block", "count_all", "ignore_camera"),
)
def _evaluate_rank_jax(
    distmat, q_cols, q_pids, g_pids, q_camids, g_camids, max_rank, query_chunk,
    g_block=8192, count_all=False, ignore_camera=False,
):
    num_q = distmat.shape[0]
    q_pids = q_pids.astype(jnp.int32)
    q_camids = q_camids.astype(jnp.int32)
    g_pids = g_pids.astype(jnp.int32)
    g_camids = g_camids.astype(jnp.int32)

    pad = (-num_q) % query_chunk
    distmat_p = jnp.pad(distmat, ((0, pad), (0, 0)))
    # Padded queries get pid -1 / all -1 columns → zero matches → excluded.
    q_cols_p = jnp.pad(q_cols, ((0, pad), (0, 0)), constant_values=-1)
    q_pids_p = jnp.pad(q_pids, (0, pad), constant_values=-1)
    q_camids_p = jnp.pad(q_camids, (0, pad), constant_values=-1)

    n_chunks = distmat_p.shape[0] // query_chunk
    dist_chunks = distmat_p.reshape(n_chunks, query_chunk, -1)
    qcol_chunks = q_cols_p.reshape(n_chunks, query_chunk, -1)
    qp_chunks = q_pids_p.reshape(n_chunks, query_chunk)
    qc_chunks = q_camids_p.reshape(n_chunks, query_chunk)

    def body(args):
        d, cols, qp, qc = args
        return _rank_chunk_counting(
            d, cols, qp, qc, g_pids, g_camids, max_rank, g_block=g_block,
            ignore_camera=ignore_camera,
        )

    cmc_rows, ap, valid = jax.lax.map(body, (dist_chunks, qcol_chunks, qp_chunks, qc_chunks))
    cmc_rows = cmc_rows.reshape(-1, max_rank)
    ap = ap.reshape(-1)
    valid = valid.reshape(-1)

    # count_all: average over every real query (unmatched queries count as
    # zero rows) — the BRIAR convention (validateModels.py:84-105); default
    # Market protocol averages over matched queries only.
    denom = jnp.float32(num_q) if count_all else jnp.maximum(valid.sum(), 1).astype(jnp.float32)
    cmc = (cmc_rows * valid[:, None]).sum(axis=0) / denom
    mAP = (ap * valid).sum() / denom
    return cmc, mAP


def evaluate_rank_jax(
    distmat: jnp.ndarray,
    q_pids: jnp.ndarray,
    g_pids: jnp.ndarray,
    q_camids: jnp.ndarray,
    g_camids: jnp.ndarray,
    max_rank: int = 50,
    query_chunk: int = 512,
    max_positives: int | None = None,
    g_block: int = 8192,
    count_all: bool = False,
    ignore_camera: bool = False,
):
    """Market-protocol CMC curve + mAP, fully on device.

    Argument order mirrors ``torchreid.metrics.evaluate_rank(distmat, q_pids,
    g_pids, q_camids, g_camids)`` as called at
    ``Person-ReID/validateModels.py:68``. Queries whose every same-pid gallery
    entry shares their camera are excluded from both averages (standard
    protocol).

    Chunked over queries with ``lax.map`` so peak HBM is
    O(query_chunk * num_gallery) regardless of query-set size; within a
    chunk the ranking is the sort-free counting kernel
    (:func:`_rank_chunk_counting`).

    ``ignore_camera`` disables the same-(pid, camid) junk filter (no entry is
    junk; every same-pid gallery image is a positive) and ``count_all``
    averages over every query — together they give the BRIAR argsort-CMC
    semantics (``validateModels.py:84-105``) with the same counting kernel.
    """
    if max_positives is None:
        max_positives = max_positives_bound(g_pids)
    query_chunk = min(query_chunk, max(int(distmat.shape[0]), 1))
    q_cols = positive_columns(np.asarray(q_pids), np.asarray(g_pids), max_positives)
    # Large galleries on TPU route the O(Q·G·P) counting core through the
    # Pallas kernel (VMEM-resident distmat sweep, striped over queries at a
    # fixed geometry; BENCH.md §ranking-pallas); small protocols stay on
    # the XLA scan (kernel launch not worth it). The striped path runs a
    # host loop, so callers that trace evaluate_rank_jax inside their own
    # jit keep the fully-traceable XLA route.
    if _pallas_gate(distmat.shape[1]) and not isinstance(distmat, jax.core.Tracer):
        return _evaluate_rank_pallas_counts(
            distmat, jnp.asarray(q_cols), q_pids, g_pids, q_camids, g_camids,
            max_rank, query_chunk, count_all=count_all,
            ignore_camera=ignore_camera,
        )
    return _evaluate_rank_jax(
        distmat, jnp.asarray(q_cols), q_pids, g_pids, q_camids, g_camids,
        max_rank, query_chunk, g_block=g_block, count_all=count_all,
        ignore_camera=ignore_camera,
    )


def evaluate_rank_sharded(
    query_fvs,
    gallery_fvs,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    mesh=None,
    max_rank: int = 50,
    count_all: bool = False,
    ignore_camera: bool = False,
    query_chunk: int = 512,
):
    """Fully sharded end-to-end ranking: queries shard over the ``data``
    mesh axis; every device computes its queries' distance rows against the
    replicated gallery, ranks them locally, and the CMC/AP sums merge with
    one ``psum`` — the SPMD replacement for the reference's CPU
    gather-then-Cython flow (``evaluate.py:291`` + ``rank_cy``).

    Takes raw embeddings (normalized internally). Scales to DeepChange-size
    query sets by never materializing the full (Q, G) matrix on one device:
    each device additionally chunks ITS shard ``query_chunk`` rows at a time
    (``lax.map``, same scheme as :func:`evaluate_rank_jax`), so peak HBM is
    O(query_chunk · num_gallery) however lopsided the query/device ratio —
    a 1-chip mesh ranks the full 17.5k x 63k protocol in bounded memory.
    ``count_all``/``ignore_camera`` select the BRIAR convention exactly as
    in :func:`evaluate_rank_jax`.
    """
    from daliid_tpu.parallel.mesh import make_mesh

    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size

    q = np.asarray(query_fvs, np.float32)
    q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
    g = np.asarray(gallery_fvs, np.float32)
    g = g / (np.linalg.norm(g, axis=1, keepdims=True) + 1e-12)
    num_q = q.shape[0]
    pad = (-num_q) % n_dev
    q = np.pad(q, ((0, pad), (0, 0)))
    qp = np.pad(np.asarray(q_pids, np.int32), (0, pad), constant_values=-1)
    qc = np.pad(np.asarray(q_camids, np.int32), (0, pad), constant_values=-1)
    gp = np.asarray(g_pids, np.int32)
    gc = np.asarray(g_camids, np.int32)

    max_positives = max_positives_bound(gp)
    qcols = np.pad(
        positive_columns(np.asarray(q_pids), gp, max_positives),
        ((0, pad), (0, 0)), constant_values=-1,
    )

    fn = _sharded_rank_fn(
        mesh, max_rank, ignore_camera, query_chunk,
        use_pallas=_pallas_gate(g.shape[0]),
    )
    # host numpy straight into the jit: each process passes the same global
    # arrays and jax materializes only the addressable shards — required for
    # multi-process meshes (a committed local device array cannot be
    # resharded onto non-addressable devices), free on one process
    cmc_sum, ap_sum, n_valid = fn(q, qcols, qp, qc, g, gp, gc)
    denom = float(num_q) if count_all else max(float(n_valid), 1.0)
    return np.asarray(cmc_sum) / denom, float(ap_sum) / denom


def evaluate_rank_sharded_multihead(
    q_heads,
    g_heads,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    mesh=None,
    max_rank: int = 50,
    count_all: bool = False,
    ignore_camera: bool = False,
    query_chunk: int = 512,
    head_weighting: str = "mean",
):
    """Sharded ranking of a multi-head ensemble WITHOUT materializing any
    full per-head (Q, G) distance matrix (VERDICT r3 item 6).

    The ensemble distance of the reference's multi-head eval
    (``Person-ReID/evaluate.py:239-279``) is an elementwise merge of
    per-head cosine distances — ``mean`` (the active ``:279`` path) or the
    per-pair ``max(|q_h|, |g_h|)`` magnitude weighting (``:247-249``). Both
    are computable per (query, gallery) pair from per-head features, so
    each device builds only ITS query chunk's merged distance rows against
    the replicated per-head galleries and ranks them locally, exactly like
    :func:`evaluate_rank_sharded`; peak HBM stays
    O(query_chunk · num_gallery) per head-merge, never (Q, G).

    ``q_heads``/``g_heads`` are sequences of RAW (N, D_h) embeddings (one
    per head, dims may differ); normalization happens here, while the
    magnitude weights use the raw norms — matching ``cli/evaluate.py``'s
    replicated path bit-for-bit in protocol (fp tolerance in values).
    """
    from daliid_tpu.parallel.mesh import make_mesh

    if head_weighting not in ("mean", "magnitude"):
        raise ValueError(f"head_weighting must be mean|magnitude, got {head_weighting!r}")
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size

    def _prep(heads):
        """→ (concat normalized (N, sum D_h), raw-norm magnitudes (N, H))."""
        normed, mags = [], []
        for h in heads:
            h = np.asarray(h, np.float32)
            m = np.linalg.norm(h, axis=1, keepdims=True)
            normed.append(h / (m + 1e-12))
            mags.append(m)
        return np.concatenate(normed, axis=1), np.concatenate(mags, axis=1)

    dims = tuple(int(np.asarray(h).shape[1]) for h in q_heads)
    if dims != tuple(int(np.asarray(h).shape[1]) for h in g_heads):
        raise ValueError("query/gallery head dims differ")
    q, q_mags = _prep(q_heads)
    g, g_mags = _prep(g_heads)
    num_q = q.shape[0]
    pad = (-num_q) % n_dev
    q = np.pad(q, ((0, pad), (0, 0)))
    q_mags = np.pad(q_mags, ((0, pad), (0, 0)), constant_values=1.0)
    qp = np.pad(np.asarray(q_pids, np.int32), (0, pad), constant_values=-1)
    qc = np.pad(np.asarray(q_camids, np.int32), (0, pad), constant_values=-1)
    gp = np.asarray(g_pids, np.int32)
    gc = np.asarray(g_camids, np.int32)

    max_positives = max_positives_bound(gp)
    qcols = np.pad(
        positive_columns(np.asarray(q_pids), gp, max_positives),
        ((0, pad), (0, 0)), constant_values=-1,
    )

    fn = _sharded_rank_multihead_fn(
        mesh, max_rank, ignore_camera, query_chunk, dims, head_weighting,
        use_pallas=_pallas_gate(g.shape[0]),
    )
    cmc_sum, ap_sum, n_valid = fn(q, qcols, qp, qc, q_mags, g, gp, gc, g_mags)
    denom = float(num_q) if count_all else max(float(n_valid), 1.0)
    return np.asarray(cmc_sum) / denom, float(ap_sum) / denom


@functools.lru_cache(maxsize=16)
def _sharded_rank_multihead_fn(mesh, max_rank: int, ignore_camera: bool,
                               query_chunk: int, dims: tuple, weighting: str,
                               use_pallas: bool = False,
                               interpret: bool = False):
    """Compiled shard_map program for the multi-head ensemble ranking;
    cached per configuration like :func:`_sharded_rank_fn`. ``dims`` (the
    static per-head feature widths) slice the concatenated embeddings
    inside the traced body — head count is small and static, so the Python
    loop unrolls into one fused program."""
    from jax.sharding import PartitionSpec as P

    def local(q_l, qcols_l, qp_l, qc_l, qm_l, g_r, gp_r, gc_r, gm_r):
        n_local = q_l.shape[0]
        chunk = min(query_chunk, max(n_local, 1))
        cpad = (-n_local) % chunk
        q_p = jnp.pad(q_l, ((0, cpad), (0, 0)))
        qm_p = jnp.pad(qm_l, ((0, cpad), (0, 0)), constant_values=1.0)
        cols_p = jnp.pad(qcols_l, ((0, cpad), (0, 0)), constant_values=-1)
        qp_p = jnp.pad(qp_l, (0, cpad), constant_values=-1)
        qc_p = jnp.pad(qc_l, (0, cpad), constant_values=-1)
        n_chunks = q_p.shape[0] // chunk

        def body(args):
            q_c, cols_c, qp_c, qc_c, qm_c = args
            num = 0.0
            den = 0.0
            off = 0
            for h, d in enumerate(dims):
                qh = jax.lax.slice_in_dim(q_c, off, off + d, axis=1)
                gh = jax.lax.slice_in_dim(g_r, off, off + d, axis=1)
                off += d
                dist_h = 1.0 - jnp.dot(qh, gh.T, preferred_element_type=jnp.float32)
                if weighting == "magnitude":
                    w = jnp.maximum(qm_c[:, h][:, None], gm_r[:, h][None, :])
                    num = num + w * dist_h
                    den = den + w
                else:
                    num = num + dist_h
            dist = num / (den if weighting == "magnitude" else float(len(dims)))
            cmc_rows, ap, valid = _chunk_ranker(
                use_pallas, interpret, max_rank, ignore_camera
            )(dist, cols_c, qp_c, qc_c, gp_r, gc_r)
            valid_f = valid.astype(jnp.float32)
            return (
                jnp.sum(cmc_rows * valid_f[:, None], axis=0),
                jnp.sum(ap * valid_f),
                jnp.sum(valid_f),
            )

        cmc_c, ap_c, nv_c = jax.lax.map(
            body,
            (
                q_p.reshape(n_chunks, chunk, -1),
                cols_p.reshape(n_chunks, chunk, -1),
                qp_p.reshape(n_chunks, chunk),
                qc_p.reshape(n_chunks, chunk),
                qm_p.reshape(n_chunks, chunk, -1),
            ),
        )
        cmc_sum = jax.lax.psum(jnp.sum(cmc_c, axis=0), "data")
        ap_sum = jax.lax.psum(jnp.sum(ap_c), "data")
        n_valid = jax.lax.psum(jnp.sum(nv_c), "data")
        return cmc_sum, ap_sum, n_valid

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P("data", None), P("data", None), P("data"), P("data"),
                P("data", None), P(), P(), P(), P(),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=16)
def _sharded_rank_fn(mesh, max_rank: int, ignore_camera: bool, query_chunk: int,
                     use_pallas: bool = False, interpret: bool = False):
    """Compiled shard_map ranking program, cached per configuration so
    per-epoch validation / multi-split evaluation reuse one executable
    instead of re-tracing each call (jit handles new shapes within a cache
    entry). ``use_pallas`` routes each chunk's counting core through the
    Pallas kernel (TPU large-gallery protocols; BENCH.md §ranking-pallas)."""
    from jax.sharding import PartitionSpec as P

    def local(q_l, qcols_l, qp_l, qc_l, g_r, gp_r, gc_r):
        n_local = q_l.shape[0]
        chunk = min(query_chunk, max(n_local, 1))
        cpad = (-n_local) % chunk
        # padded rows: pid -1 / cols -1 → zero positives → valid False
        q_p = jnp.pad(q_l, ((0, cpad), (0, 0)))
        cols_p = jnp.pad(qcols_l, ((0, cpad), (0, 0)), constant_values=-1)
        qp_p = jnp.pad(qp_l, (0, cpad), constant_values=-1)
        qc_p = jnp.pad(qc_l, (0, cpad), constant_values=-1)
        n_chunks = q_p.shape[0] // chunk

        def body(args):
            q_c, cols_c, qp_c, qc_c = args
            dist = 1.0 - jnp.dot(q_c, g_r.T, preferred_element_type=jnp.float32)
            cmc_rows, ap, valid = _chunk_ranker(
                use_pallas, interpret, max_rank, ignore_camera
            )(dist, cols_c, qp_c, qc_c, gp_r, gc_r)
            valid_f = valid.astype(jnp.float32)
            return (
                jnp.sum(cmc_rows * valid_f[:, None], axis=0),
                jnp.sum(ap * valid_f),
                jnp.sum(valid_f),
            )

        cmc_c, ap_c, nv_c = jax.lax.map(
            body,
            (
                q_p.reshape(n_chunks, chunk, -1),
                cols_p.reshape(n_chunks, chunk, -1),
                qp_p.reshape(n_chunks, chunk),
                qc_p.reshape(n_chunks, chunk),
            ),
        )
        cmc_sum = jax.lax.psum(jnp.sum(cmc_c, axis=0), "data")
        ap_sum = jax.lax.psum(jnp.sum(ap_c), "data")
        n_valid = jax.lax.psum(jnp.sum(nv_c), "data")
        return cmc_sum, ap_sum, n_valid

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data"), P("data"), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


def evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """Pure-numpy per-query reference of the identical protocol (host scan).

    Used as the parity oracle for :func:`evaluate_rank_jax` and the C++
    kernel; mirrors the semantics of torchreid's ``evaluate_cy`` as invoked
    at ``Person-ReID/validateModels.py:68``.
    """
    distmat = np.asarray(distmat)
    q_pids = np.asarray(q_pids, dtype=np.int64)
    g_pids = np.asarray(g_pids, dtype=np.int64)
    q_camids = np.asarray(q_camids, dtype=np.int64)
    g_camids = np.asarray(g_camids, dtype=np.int64)

    num_q, num_g = distmat.shape
    order_all = np.argsort(distmat, axis=1, kind="stable")

    cmc_sum = np.zeros(max_rank, dtype=np.float64)
    ap_list = []
    for qi in range(num_q):
        order = order_all[qi]
        gp = g_pids[order]
        gc = g_camids[order]
        junk = (gp == q_pids[qi]) & (gc == q_camids[qi])
        raw = (gp == q_pids[qi])[~junk].astype(np.float64)
        num_rel = raw.sum()
        if num_rel == 0:
            continue
        csum = raw.cumsum()
        hit = np.minimum(csum, 1.0)
        cmc_sum += hit[:max_rank] if hit.shape[0] >= max_rank else np.pad(
            hit, (0, max_rank - hit.shape[0]), constant_values=hit[-1]
        )
        precision = csum / np.arange(1, raw.shape[0] + 1)
        ap_list.append(float((precision * raw).sum() / num_rel))

    num_valid = max(len(ap_list), 1)
    return cmc_sum / num_valid, float(np.mean(ap_list)) if ap_list else 0.0


def evaluate_rank(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50, backend="jax"):
    """Dispatch wrapper mirroring torchreid's public ``evaluate_rank``."""
    if backend == "jax":
        cmc, mAP = evaluate_rank_jax(
            jnp.asarray(distmat),
            jnp.asarray(np.asarray(q_pids, dtype=np.int32)),
            jnp.asarray(np.asarray(g_pids, dtype=np.int32)),
            jnp.asarray(np.asarray(q_camids, dtype=np.int32)),
            jnp.asarray(np.asarray(g_camids, dtype=np.int32)),
            max_rank=max_rank,
        )
        return np.asarray(cmc), float(mAP)
    if backend == "numpy":
        return evaluate_rank_numpy(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    if backend == "cpp":
        from daliid_tpu.metrics.cpp_ref import evaluate_rank_cpp

        return evaluate_rank_cpp(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    raise ValueError(f"unknown backend: {backend!r}")
