"""k-reciprocal re-ranking (Zhong et al., CVPR'17) — vectorized for TPU.

The reference exposes re-ranking as an optional eval step through
torchreid's loop-based implementation (commented call sites at
``Person-ReID/validateModels.py:49-53`` and ``evaluate.py:294-298``). That
implementation is a per-sample Python scan; here the whole algorithm is
dense masked linear algebra:

- k-NN / k-reciprocal sets as boolean matrices (rank-position thresholds);
- the 2/3-overlap cluster expansion as a boolean matmul + count compare;
- local query expansion as one (N, N) @ (N, N) matmul;
- the Jaccard distance via chunked broadcast min/sum reductions
  (rows are L1-normalized so ``sum max = 2 - sum min``).

O(N^2) memory in bool/f32 (Market: ~0.4-1.5 GB peak, chunked) — HBM-sized,
and every heavy op is an MXU matmul or a VPU reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _rank_position_mask(dist: jnp.ndarray, k: int) -> jnp.ndarray:
    """bool[i, j] = j is among i's k nearest (excluding nothing; the self
    column is naturally rank 0 for the qq/gg diagonal)."""
    order = jnp.argsort(dist, axis=1)
    ranks = jnp.argsort(order, axis=1)  # position of each column in the sort
    return ranks < k


def _rerank_core_impl(original_dist: jnp.ndarray, num_q: int, k1: int, k2: int,
                      lambda_value: float, chunk: int = 128):
    n = original_dist.shape[0]
    # symmetrize like the standard implementation (dist built from cosine
    # distances is already symmetric up to fp error)
    dist = jnp.minimum(original_dist, original_dist.T)

    knn1 = _rank_position_mask(dist, k1 + 1)
    reciprocal = knn1 & knn1.T

    # cluster expansion: add R(j, k1/2) when |R(j) ∩ R(i)| >= 2/3 |R(j)|
    half = _rank_position_mask(dist, k1 // 2 + 1)
    rec_half = half & half.T
    overlap = jnp.dot(
        reciprocal.astype(jnp.float32), rec_half.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )  # overlap[i, j] = |R(i) ∩ R_half(j)|
    sizes = rec_half.sum(axis=1).astype(jnp.float32)
    expand = overlap >= (2.0 / 3.0) * sizes[None, :]
    expanded = reciprocal | (
        jnp.dot(
            (reciprocal & expand).astype(jnp.float32), rec_half.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) > 0
    )

    # Gaussian-weighted membership, L1-normalized per row
    v = jnp.where(expanded, jnp.exp(-dist), 0.0)
    v = v / jnp.maximum(v.sum(axis=1, keepdims=True), 1e-12)

    # local query expansion over k2 neighbors
    knn2 = _rank_position_mask(dist, k2).astype(jnp.float32) / k2
    v = jnp.dot(knn2, v, preferred_element_type=jnp.float32)
    v = v / jnp.maximum(v.sum(axis=1, keepdims=True), 1e-12)

    # Jaccard over query rows vs all rows, chunked: rows sum to 1 so
    # jac = 1 - min_sum / (2 - min_sum)
    v_q = v[:num_q]

    pad = (-num_q) % chunk
    v_q_pad = jnp.pad(v_q, ((0, pad), (0, 0)))
    n_chunks = v_q_pad.shape[0] // chunk

    def body(vq_chunk):
        min_sum = jnp.sum(jnp.minimum(vq_chunk[:, None, :], v[None, :, :]), axis=-1)
        return 1.0 - min_sum / (2.0 - min_sum)

    jaccard = jax.lax.map(body, v_q_pad.reshape(n_chunks, chunk, n)).reshape(-1, n)[:num_q]
    final = (1.0 - lambda_value) * jaccard + lambda_value * original_dist[:num_q]
    return final[:, num_q:]


_rerank_core = functools.partial(jax.jit, static_argnames=("num_q", "k1", "k2", "chunk"))(
    _rerank_core_impl
)


@functools.partial(jax.jit, static_argnames=("k1", "k2"))
def rerank_shortlists(fulls: jnp.ndarray, k1: int, k2: int, lambda_value: float):
    """Batched per-probe re-ranking for the serving path.

    ``fulls``: (Q, 1+depth, 1+depth) distance matrices — row/col 0 is the
    probe, the rest its shortlist candidates. Each probe is an independent
    num_q=1 instance of the same k-reciprocal algorithm (vmapped over the
    batch). → (Q, depth) re-ranked distances. ``chunk=1``: one query row
    per instance, so the Jaccard chunking degenerates."""
    fn = lambda f: _rerank_core_impl(f, 1, k1, k2, lambda_value, chunk=1)
    return jax.vmap(fn)(fulls)[:, 0, :]


def re_ranking(
    distmat_qg, distmat_qq, distmat_gg, k1: int = 20, k2: int = 6, lambda_value: float = 0.3
) -> np.ndarray:
    """→ re-ranked (Q, G) distance matrix.

    Same signature/semantics as the torchreid call the reference comments
    out (``validateModels.py:49-53``): pass the query-gallery, query-query,
    gallery-gallery distance matrices.
    """
    qq = jnp.asarray(distmat_qq, jnp.float32)
    qg = jnp.asarray(distmat_qg, jnp.float32)
    gg = jnp.asarray(distmat_gg, jnp.float32)
    num_q = qq.shape[0]
    full = jnp.block([[qq, qg], [qg.T, gg]])
    return np.asarray(_rerank_core(full, num_q=int(num_q), k1=k1, k2=k2, lambda_value=float(lambda_value)))
