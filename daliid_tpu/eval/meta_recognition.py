"""Weibull meta-recognition score fusion — jit-compiled EVT renormalization.

Re-implements the reference's ``libmr`` / ``Meta_Recognition`` pair
(``Person-ReID/evaluate.py:394-627``):

- batched 2-parameter Weibull maximum-likelihood fits via Newton-Raphson on
  the shape parameter (``libmr._fit``, ``evaluate.py:531-580``) — here a
  ``lax.fori_loop`` with a freeze-once-converged mask instead of a Python
  loop with host-side early exit;
- tail fitting ``FitHigh``/``FitLow`` (top-``tailSize`` scores per row,
  translated past the smallest tail score, ``evaluate.py:419-437,477-495``);
- ``metarec``: per-gallery Weibull over non-top scores → CDF-based
  confidence weights (``evaluate.py:587-608``);
- ``mrfuse``: confidence-weighted blend of three similarity matrices
  (``evaluate.py:610-627``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class WeibullFit(NamedTuple):
    shape: jnp.ndarray        # (N,) k
    scale: jnp.ndarray        # (N,) lambda
    small_score: jnp.ndarray  # (N,) tail translation anchor
    sign: int                 # +1 FitHigh, -1 FitLow
    translate: float


def weibull_mle(data: jnp.ndarray, iters: int = 100, eps: float = 1e-6):
    """Row-wise 2-param Weibull MLE. ``data`` (N, M) with x > 0.

    Newton-Raphson on k (shape); scale follows in closed form. Rows are
    frozen once |Δk| < eps, matching the convergence-time snapshot of the
    reference fit (``evaluate.py:547-579``).
    """
    data = data.astype(jnp.float64) if jax.config.jax_enable_x64 else data.astype(jnp.float32)
    ln_x = jnp.log(data)
    mean_ln_x = jnp.mean(ln_x, axis=1)

    def body(_, carry):
        k, done, k_rec, lam_rec = carry
        x_k = data ** k[:, None]
        x_k_ln = x_k * ln_x
        fg = jnp.sum(x_k, axis=1)
        ff = jnp.sum(x_k_ln, axis=1)
        ff_prime = jnp.sum(x_k_ln * ln_x, axis=1)
        ff_by_fg = ff / fg
        f = ff_by_fg - mean_ln_x - 1.0 / k
        f_prime = (ff_prime / fg - ff_by_fg**2) + 1.0 / (k * k)
        k_new = jnp.where(done, k, k - f / f_prime)
        newly_done = (~done) & (jnp.abs(k_new - k) < eps)
        lam = jnp.mean(data ** k_new[:, None], axis=1) ** (1.0 / k_new)
        k_rec = jnp.where(newly_done, k_new, k_rec)
        lam_rec = jnp.where(newly_done, lam, lam_rec)
        return k_new, done | newly_done, k_rec, lam_rec

    n = data.shape[0]
    k0 = jnp.ones(n, data.dtype)
    done0 = jnp.zeros(n, bool)
    k_final, done, k_rec, lam_rec = jax.lax.fori_loop(
        0, iters, body, (k0, done0, k0, jnp.ones(n, data.dtype))
    )
    # rows that never converged: use the last iterate
    lam_final = jnp.mean(data ** k_final[:, None], axis=1) ** (1.0 / k_final)
    shape = jnp.where(done, k_rec, k_final)
    scale = jnp.where(done, lam_rec, lam_final)
    return shape, scale


def fit_tail(
    data: jnp.ndarray, tail_size: int, sign: int = 1, translate: float = 1.0
) -> WeibullFit:
    """FitHigh (sign=+1) / FitLow (sign=-1): Weibull over the top-``tail_size``
    scores per row (``evaluate.py:419-437,477-495``)."""
    d = data * sign
    tail = jax.lax.top_k(d, tail_size)[0]
    small = tail[:, tail_size - 1]
    processed = tail + translate - small[:, None]
    shape, scale = weibull_mle(jnp.maximum(processed, 1e-12))
    return WeibullFit(shape=shape, scale=scale, small_score=small, sign=sign, translate=translate)


def wscore(fit: WeibullFit, scores: jnp.ndarray, reversed_: bool = False) -> jnp.ndarray:
    """Weibull CDF confidence of ``scores`` (R, N) under N per-column fits
    (``libmr.wscore``, ``evaluate.py:463-475``)."""
    x = scores * fit.sign
    x = x + fit.translate - fit.small_score[None, :]
    x = jnp.maximum(x, 0.0)
    cdf = 1.0 - jnp.exp(-((x / fit.scale[None, :]) ** fit.shape[None, :]))
    return 1.0 - cdf if reversed_ else cdf


@functools.partial(jax.jit, static_argnames=("topk", "kill_scale"))
def metarec(score_matrix: jnp.ndarray, topk: int = 20, kill_scale: float = 1.0) -> jnp.ndarray:
    """Meta-recognition weights for a (Q, G) similarity matrix
    (``Meta_Recognition.metarec`` with ``use_columns=False``,
    ``evaluate.py:599-608``): remove each row's top-k scores, fit a Weibull
    per *gallery column* over the remaining scores, return the CDF
    confidence of every original score under its column's Weibull."""
    q, g = score_matrix.shape
    scores = jnp.nan_to_num(score_matrix, nan=0.0)
    top_vals, top_idx = jax.lax.top_k(scores, topk)
    kill = jnp.zeros_like(scores)
    kill = jax.vmap(lambda k_row, idx, val: k_row.at[idx].set(val))(kill, top_idx, top_vals)
    tail_scores = jnp.nan_to_num((scores - kill_scale * kill).T, nan=0.0)  # (G, Q)
    fit = fit_tail(tail_scores, max(q - topk - 1, 2), sign=1)
    w = wscore(fit, score_matrix)
    return jnp.nan_to_num(w, nan=0.0)


def mrfuse(s1, s2, s3, topk: int = 20):
    """Confidence-weighted fusion of three similarity matrices
    (``Meta_Recognition.mrfuse``, ``evaluate.py:610-627``)."""
    w1 = metarec(jnp.asarray(s1), topk)
    w2 = metarec(jnp.asarray(s2), topk)
    w3 = metarec(jnp.asarray(s3), topk)
    return (w1 * s1 + w2 * s2 + w3 * s3) / (w1 + w2 + w3 + 1e-12)
