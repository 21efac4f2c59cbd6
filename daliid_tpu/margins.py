"""Margin-based classifier heads: ArcFace / CosFace / AM-Softmax / Circle.

The reference's TransReID builders select these via ``cfg.MODEL.ID_LOSS_TYPE``
(``Person-ReID/make_models.py:261-277``) from an external
``loss.metric_learning`` module (import commented out upstream,
``make_models.py:6``). Implemented here as pure functions over L2-normalized
embeddings and a normalized class-weight matrix — one MXU matmul plus masked
margin arithmetic — so they drop into any jit'd train step.

All return logits to feed ``optax.softmax_cross_entropy_with_integer_labels``
(or :func:`margin_softmax_loss` below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _normalized_cosine(embeddings, weights):
    e = embeddings / (jnp.linalg.norm(embeddings, axis=1, keepdims=True) + 1e-12)
    w = weights / (jnp.linalg.norm(weights, axis=0, keepdims=True) + 1e-12)
    return jnp.clip(jnp.dot(e, w, preferred_element_type=jnp.float32), -1.0 + 1e-7, 1.0 - 1e-7)


def arcface_logits(embeddings, weights, labels, s: float = 30.0, m: float = 0.50):
    """Additive angular margin: cos(θ_y + m) on the target class."""
    cos = _normalized_cosine(embeddings, weights)
    theta = jnp.arccos(cos)
    target = jnp.cos(theta + m)
    onehot = jax.nn.one_hot(labels, cos.shape[1], dtype=cos.dtype)
    return s * (onehot * target + (1.0 - onehot) * cos)


def cosface_logits(embeddings, weights, labels, s: float = 30.0, m: float = 0.35):
    """Additive cosine margin: cos(θ_y) − m on the target class (CosFace /
    AM-Softmax share this form; AM-Softmax conventionally uses m≈0.35-0.4)."""
    cos = _normalized_cosine(embeddings, weights)
    onehot = jax.nn.one_hot(labels, cos.shape[1], dtype=cos.dtype)
    return s * (cos - m * onehot)


def amsoftmax_logits(embeddings, weights, labels, s: float = 30.0, m: float = 0.35):
    return cosface_logits(embeddings, weights, labels, s=s, m=m)


def circle_logits(embeddings, weights, labels, s: float = 48.0, m: float = 0.25):
    """Circle loss (classifier form): per-logit adaptive re-weighting
    α_p (cos − Δ_p) for the target, α_n (cos − Δ_n) elsewhere, with
    O_p = 1 + m, O_n = −m, Δ_p = 1 − m, Δ_n = m."""
    cos = _normalized_cosine(embeddings, weights)
    onehot = jax.nn.one_hot(labels, cos.shape[1], dtype=cos.dtype)
    alpha_p = jnp.maximum(1.0 + m - cos, 0.0)
    alpha_n = jnp.maximum(cos + m, 0.0)
    logit_p = alpha_p * (cos - (1.0 - m))
    logit_n = alpha_n * (cos - m)
    return s * (onehot * logit_p + (1.0 - onehot) * logit_n)


_HEADS = {
    "arcface": arcface_logits,
    "cosface": cosface_logits,
    "amsoftmax": amsoftmax_logits,
    "circle": circle_logits,
}


def margin_logits(kind: str, embeddings, weights, labels, **kw):
    if kind not in _HEADS:
        raise KeyError(f"unknown margin head {kind!r}; available: {sorted(_HEADS)}")
    return _HEADS[kind](embeddings, weights, labels, **kw)


def margin_softmax_loss(kind: str, embeddings, weights, labels, sample_mask=None, **kw):
    """Mean masked cross entropy over margin logits."""
    logits = margin_logits(kind, embeddings, weights, labels, **kw)
    nll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if sample_mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1)
