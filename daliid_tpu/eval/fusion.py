"""Clean+distorted model fusion — the DaliID paper's test-time ensembling.

Mirrors ``Person-ReID/evaluateCleanATModels.py``:

- feature concatenation ensemble (``evaluateCleanATModels.py:103-113``);
- simple distance-matrix average (``evaluateCleanATModels.py:127-133``);
- **magnitude-weighted fusion** ("result provided in the paper",
  ``evaluateCleanATModels.py:135-160``): per-image feature magnitude under a
  chosen pooling (gap/gmp/both) as a quality proxy; per-(query, gallery)
  pair weight = max(q_mag, g_mag); fused distmat = weighted blend of the two
  models' distmats (``evaluateCleanATModels.py:154-157``);
- ROC dump (``evaluateCleanATModels.py:276-292``).

All fusion math is jit-able jnp ops over (Q, G) matrices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from daliid_tpu.metrics.ranking import cosine_distance_matrix


def _l2n(x: jnp.ndarray) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


def concat_features_distmat(q_fvs_a, q_fvs_b, g_fvs_a, g_fvs_b) -> jnp.ndarray:
    """Concatenate two models' embeddings → normalize → cosine distmat
    (``evaluateCleanATModels.py:103-110``)."""
    q = jnp.concatenate([jnp.asarray(q_fvs_a), jnp.asarray(q_fvs_b)], axis=1)
    g = jnp.concatenate([jnp.asarray(g_fvs_a), jnp.asarray(g_fvs_b)], axis=1)
    return cosine_distance_matrix(q, g)


def average_distmats(*distmats) -> jnp.ndarray:
    """Uniform distmat ensemble (``evaluateCleanATModels.py:127``; also the
    two-model CLI's ``(d1+d2)/2``, ``evaluate_ensembled_models.py:275-314``)."""
    stacked = jnp.stack([jnp.asarray(d) for d in distmats])
    return jnp.mean(stacked, axis=0)


def magnitude_weights(fvs) -> np.ndarray:
    """Per-image feature magnitude, (N, 1) — the quality proxy computed by
    ``getWeightsByMagnitude`` (``evaluateCleanATModels.py:249-256``).

    Extract the features with the desired pooling (``feature='gap'|'gmp'|
    'both'`` on the model) and pass the *unnormalized* embeddings here.
    """
    fvs = np.asarray(fvs)
    return np.linalg.norm(fvs, axis=1, keepdims=True)


def magnitude_weighted_distmat(
    distmat_a, distmat_b, q_mag_a, g_mag_a, q_mag_b, g_mag_b
) -> jnp.ndarray:
    """Per-pair max-magnitude weighted blend of two distmats
    (``evaluateCleanATModels.py:154-157``):

        w_m[i, j] = max(q_mag_m[i], g_mag_m[j])      for model m ∈ {a, b}
        fused     = (w_a·d_a + w_b·d_b) / (w_a + w_b)
    """
    q_a = jnp.asarray(q_mag_a).reshape(-1, 1)
    g_a = jnp.asarray(g_mag_a).reshape(1, -1)
    q_b = jnp.asarray(q_mag_b).reshape(-1, 1)
    g_b = jnp.asarray(g_mag_b).reshape(1, -1)
    w_a = jnp.maximum(q_a, g_a)
    w_b = jnp.maximum(q_b, g_b)
    return (w_a * jnp.asarray(distmat_a) + w_b * jnp.asarray(distmat_b)) / (w_a + w_b)


def roc_arrays(distmat, q_pids, g_pids):
    """(labels, scores) for an ROC over all (query, gallery) pairs
    (``evaluateCleanATModels.py:276-292``): label = same identity, score =
    ``1 - dist/2``."""
    q_pids = np.asarray(q_pids).reshape(-1, 1)
    g_pids = np.asarray(g_pids).reshape(1, -1)
    labels = (q_pids == g_pids).astype(np.int32).ravel()
    scores = (1.0 - np.asarray(distmat) / 2.0).ravel()
    return labels, scores
