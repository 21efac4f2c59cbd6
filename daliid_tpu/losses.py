"""DaliID loss library — cosine-scheduled distortion-weighted batch losses.

Re-implements the reference's ``Person-ReID/losses.py`` (~20 losses) as pure,
jit-compilable, fully vectorized JAX functions. Two systematic departures
from the reference:

1. The reference iterates Python loops over batch samples with GPU syncs
   (e.g. the per-sample loop inside ``BatchWeightedProxyLoss``,
   ``losses.py:295-338``, flagged in SURVEY.md §3.1 as a hot loop). Here
   every loss is a masked batched matrix expression — one or two MXU matmuls
   plus VPU reductions — with no data-dependent shapes.
2. Ragged quantities (per-class proxy counts, per-sample positive counts)
   are fixed-size + validity-masked so shapes stay static under ``jit``.

Weight tables: the 6-level table (clean + turbulence strengths 1-5) at
``losses.py:42-47``; the 13-level table at ``losses.py:92-104``. All weights
ramp from ``n_min`` to 1.0 on the cosine schedule ``losses.py:5-7``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# n_min ramps for the 6-level distortion weight table (losses.py:42-47).
N_MIN_6 = (1.0, 0.8, 0.6, 0.4, 0.2, 0.1)
# n_min ramps for the 13-level table (losses.py:92-104).
N_MIN_13 = (1.0, 0.90, 0.85, 0.80, 0.75, 0.70, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.1)

_EPS = 1e-9


def cosine_schedule_value(t_cur, t_max, n_min=0.0, n_max=1.0):
    """``n_min + 0.5 (n_max-n_min) (1 + cos(pi (t_max-t_cur)/t_max))``.

    Exactly ``getValueFromCosineSchedule`` (``losses.py:5-7``): starts at
    ``n_min`` when ``t_cur=0`` and reaches ``n_max`` at ``t_cur=t_max``.
    """
    return n_min + 0.5 * (n_max - n_min) * (1.0 + jnp.cos(((t_max - t_cur) / t_max) * jnp.pi))


def distortion_weights(epoch, num_epochs, n_mins=N_MIN_6) -> jnp.ndarray:
    """Per-distortion-level weight vector at the given epoch."""
    n_mins = jnp.asarray(n_mins, dtype=jnp.float32)
    return cosine_schedule_value(
        jnp.asarray(epoch, dtype=jnp.float32), float(num_epochs), n_min=n_mins, n_max=1.0
    )


def balanced_accuracy_host(predicted_labels, gt_labels) -> float:
    """Host-side balanced accuracy diagnostic over the union of label sets;
    mirrors ``getACCBal`` (``losses.py:190-203``)."""
    predicted_labels = np.asarray(predicted_labels)
    gt_labels = np.asarray(gt_labels)
    all_labels = np.union1d(np.unique(predicted_labels), np.unique(gt_labels))
    n = len(all_labels)
    p_idx = np.searchsorted(all_labels, predicted_labels)
    g_idx = np.searchsorted(all_labels, gt_labels)
    cm = np.zeros((n, n))
    np.add.at(cm, (g_idx, p_idx), 1.0)
    cm_rel = cm / (cm.sum(axis=1, keepdims=False)[:, None] + 1e-7)
    return float(np.trace(cm_rel) / n)


def _weights_for(samples_distortion, epoch, num_epochs, n_mins):
    return distortion_weights(epoch, num_epochs, n_mins)[samples_distortion]


def weighted_center_loss(
    batch_fvs: jnp.ndarray,          # (B, D), L2-normalized
    batch_labels: jnp.ndarray,       # (B,) int — center indices 0..C-1
    samples_distortion: jnp.ndarray, # (B,) int in [0, 5]
    centers: jnp.ndarray,            # (C, D), L2-normalized
    epoch,
    num_epochs: float,
    tau: float = 0.1,
    sample_mask: jnp.ndarray | None = None,  # (B,) bool; False = padding
):
    """Distortion-weighted softmax-over-centers cross entropy.

    Vectorized ``BatchWeightedCenterLoss`` (``losses.py:39-88``): per-sample
    weight ``w_i`` from the 6-level cosine table, probabilities
    ``softmax(fv·centers^T / tau)``, and loss
    ``sum_i w_i (-log p_{i,y_i}) / sum_i w_i``. Labels here are dense center
    indices (the trainer guarantees centers are ordered by label), so the
    reference's (batch x centers) label-equality mask reduces to a gather.

    Returns ``(loss, aux)`` with aux = dict(predicted, avg_max_prob,
    batch_acc_bal) matching the diagnostics at ``losses.py:84-88``
    (balanced accuracy computed on-device over batch classes).
    """
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_6) * sample_mask

    sim = jnp.dot(batch_fvs, centers.T, preferred_element_type=jnp.float32)
    log_probs = jax.nn.log_softmax(sim / tau, axis=1)
    nll = -jnp.take_along_axis(log_probs, batch_labels[:, None], axis=1)[:, 0]
    loss = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), _EPS)

    predicted = jnp.argmax(log_probs, axis=1)
    correct = (predicted == batch_labels) & sample_mask
    # On-device balanced accuracy, exactly ``getACCBal`` (losses.py:190-203):
    # per-class recall over ground-truth classes, divided by the size of the
    # UNION of ground-truth and predicted label sets (predicted-only classes
    # contribute zero recall but still count in the denominator).
    num_classes = centers.shape[0]
    per_class_correct = jax.ops.segment_sum(correct.astype(jnp.float32), batch_labels, num_classes)
    per_class_count = jax.ops.segment_sum(sample_mask.astype(jnp.float32), batch_labels, num_classes)
    present_gt = per_class_count > 0
    present_pred = (
        jax.ops.segment_sum(sample_mask.astype(jnp.float32), predicted, num_classes) > 0
    )
    acc_bal = jnp.sum(
        jnp.where(present_gt, per_class_correct / jnp.maximum(per_class_count, 1.0), 0.0)
    ) / jnp.maximum(jnp.sum(present_gt | present_pred), 1)
    max_prob = jnp.exp(jnp.max(log_probs, axis=1))
    avg_max_prob = jnp.sum(max_prob * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1)
    return loss, {"predicted": predicted, "avg_max_prob": avg_max_prob, "batch_acc_bal": acc_bal}


def center_loss(batch_fvs, batch_labels, centers, tau=0.1, sample_mask=None):
    """Unweighted softmax-over-centers CE, mean over samples
    (``BatchCenterLoss``, ``losses.py:9-37``)."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, centers.T, preferred_element_type=jnp.float32)
    log_probs = jax.nn.log_softmax(sim / tau, axis=1)
    nll = -jnp.take_along_axis(log_probs, batch_labels[:, None], axis=1)[:, 0]
    return jnp.sum(nll * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1)


def l2_center_loss(batch_fvs, batch_labels, centers, sample_mask=None):
    """Mean squared L2 distance to own center (``BatchL2CenterLoss``,
    ``losses.py:206-236``)."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    own = centers[batch_labels]
    d2 = jnp.sum((batch_fvs - own) ** 2, axis=1)
    return jnp.sum(d2 * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1)


def _proxy_positive_bound(proxy_labels, p_max: int | None) -> int:
    """Resolve the static per-class positive bound for the proxy losses.

    With ``p_max`` given, trust the caller (the trainer passes its exact
    ``num_proxies``). Otherwise default to ``min(Np, 64)`` — and when
    ``proxy_labels`` is a concrete array (not a jit tracer), verify no class
    exceeds the bound, raising instead of silently truncating positives.
    """
    if p_max is not None:
        return int(p_max)
    default = int(proxy_labels.shape[0]) if proxy_labels.shape[0] < 64 else 64
    if not isinstance(proxy_labels, jax.core.Tracer):
        lbl = np.asarray(proxy_labels)
        valid = lbl[lbl >= 0]
        if valid.size:
            max_count = int(np.bincount(valid).max())
            if max_count > default:
                raise ValueError(
                    f"a class owns {max_count} proxies but the static positive bound is "
                    f"{default}: positives would be silently truncated. Pass "
                    f"p_max={max_count} (the trainer forwards its num_proxies)."
                )
    return default


def weighted_proxy_loss(
    batch_fvs: jnp.ndarray,           # (B, D), L2-normalized
    batch_labels: jnp.ndarray,        # (B,) int class ids
    samples_distortion: jnp.ndarray,  # (B,) int in [0,5]
    proxies: jnp.ndarray,             # (Np, D), L2-normalized (padded)
    proxy_labels: jnp.ndarray,        # (Np,) int; -1 = padding slot
    epoch,
    num_epochs: float,
    tau: float = 0.1,
    sample_mask: jnp.ndarray | None = None,
    p_max: int | None = None,
):
    """Distortion-weighted hard-negative proxy softmax.

    Vectorized ``BatchWeightedProxyLoss`` (``losses.py:273-341``). Per sample
    ``i`` with ``k_i`` own-class proxies: take the ``k_i`` highest-similarity
    negative proxies (the reference's ``topk(..., k=num_positives)`` at
    ``losses.py:319``), then
    ``loss_i = -w_i · mean_j log[ exp(s_pos_j/tau) / (Σ exp(s_pos/tau) + Σ exp(s_negtop/tau)) ]``
    and ``loss = Σ loss_i / Σ w_i``.

    The per-sample variable ``k_i`` is handled with a static bound: positives
    are at most ``P_max = max proxies per class``; we take a static top-P_max
    of the negatives and mask the tail ``j >= k_i`` — numerically identical
    to the reference's ragged computation.

    ``p_max`` is that static bound. The trainer passes its ``num_proxies``
    (exact, and much cheaper than the default — top_k with k=5 instead of
    64). When omitted, the bound defaults to ``min(Np, 64)`` and — on
    concrete (non-traced) ``proxy_labels`` — the call **raises** if any class
    owns more proxies than the bound rather than silently truncating the
    positive set (contrast ``positive_columns``'s loud check,
    ``metrics/ranking.py``).
    """
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_6) * sample_mask

    sim = jnp.dot(batch_fvs, proxies.T, preferred_element_type=jnp.float32)  # (B, Np)
    is_pos = (proxy_labels[None, :] == batch_labels[:, None]) & (proxy_labels[None, :] >= 0)
    is_neg = (proxy_labels[None, :] != batch_labels[:, None]) & (proxy_labels[None, :] >= 0)

    num_pos = is_pos.sum(axis=1)  # (B,) traced values, k_i
    p_max = _proxy_positive_bound(proxy_labels, p_max)
    # Positive slots: top-P_max positive similarities (there are exactly k_i,
    # padding gets -inf → masked out below).
    pos_sims = jnp.where(is_pos, sim, -jnp.inf)
    pos_top = jax.lax.top_k(pos_sims, p_max)[0]                 # (B, P_max)
    neg_sims = jnp.where(is_neg, sim, -jnp.inf)
    neg_top = jax.lax.top_k(neg_sims, p_max)[0]                 # (B, P_max)

    slot = jnp.arange(p_max)[None, :]
    pos_valid = slot < num_pos[:, None]
    neg_valid = pos_valid  # reference keeps exactly num_positives negatives

    pos_exp = jnp.where(pos_valid, jnp.exp(pos_top / tau), 0.0)
    neg_exp = jnp.where(neg_valid, jnp.exp(neg_top / tau), 0.0)
    denom = pos_exp.sum(axis=1, keepdims=True) + neg_exp.sum(axis=1, keepdims=True)

    log_ratio = jnp.where(pos_valid, pos_top / tau - jnp.log(denom + _EPS), 0.0)
    per_sample = -jnp.sum(log_ratio, axis=1) / jnp.maximum(num_pos, 1)
    has_pos = num_pos > 0
    w = w * has_pos
    return jnp.sum(w * per_sample) / jnp.maximum(jnp.sum(w), _EPS)


def proxy_loss(batch_fvs, batch_labels, proxies, proxy_labels, top_negs=50, tau=0.1, p_max=None):
    """Unweighted proxy softmax with a fixed ``top_negs`` hardest negatives
    (``BatchProxyLoss``, ``losses.py:238-270``)."""
    sim = jnp.dot(batch_fvs, proxies.T, preferred_element_type=jnp.float32)
    is_pos = (proxy_labels[None, :] == batch_labels[:, None]) & (proxy_labels[None, :] >= 0)
    is_neg = (proxy_labels[None, :] != batch_labels[:, None]) & (proxy_labels[None, :] >= 0)
    num_pos = is_pos.sum(axis=1)
    p_max = _proxy_positive_bound(proxy_labels, p_max)

    pos_top = jax.lax.top_k(jnp.where(is_pos, sim, -jnp.inf), p_max)[0]
    neg_top = jax.lax.top_k(jnp.where(is_neg, sim, -jnp.inf), min(top_negs, proxies.shape[0]))[0]

    slot = jnp.arange(p_max)[None, :]
    pos_valid = slot < num_pos[:, None]
    pos_exp = jnp.where(pos_valid, jnp.exp(pos_top / tau), 0.0)
    neg_exp = jnp.where(jnp.isfinite(neg_top), jnp.exp(neg_top / tau), 0.0)
    denom = pos_exp.sum(1, keepdims=True) + neg_exp.sum(1, keepdims=True)
    log_ratio = jnp.where(pos_valid, pos_top / tau - jnp.log(denom + _EPS), 0.0)
    per_sample = -jnp.sum(log_ratio, axis=1) / jnp.maximum(num_pos, 1)
    return jnp.mean(per_sample)


def weighted_cross_entropy_loss(probs, labels, samples_distortion, epoch, num_epochs,
                                sample_mask=None):
    """Distortion-weighted CE over classifier probabilities
    (``BatchWeightedCrossEntropyLoss``, ``losses.py:152-187``), 13-level
    table, normalization by ``sum(w)``."""
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_13)
    if sample_mask is not None:
        w = w * sample_mask
    nll = -jnp.log(jnp.take_along_axis(probs, labels[:, None], axis=1)[:, 0] + _EPS)
    loss = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), _EPS)
    avg_max_prob = jnp.mean(jnp.max(probs, axis=1))
    return loss, avg_max_prob


def paired_distortion_loss(clean_fvs, distorted_fvs, distortion_levels, epoch, num_epochs,
                           pair_mask=None):
    """Clean↔distorted embedding-consistency L2, weighted by the 13-level
    table.

    The reference's ``distortionLoss`` (``losses.py:90-148``) randomly
    re-pairs distorted samples with clean samples of the same class; our PK
    pairer emits aligned (clean, distorted) pairs (one AT copy per clean
    image, ``train_encodersKIT.py:382-394``), so the pairing is the identity
    and the loss reduces to a weighted mean of per-pair squared distances,
    normalized by the summed weights as at ``losses.py:144-147``.
    """
    table = distortion_weights(epoch, num_epochs, N_MIN_13)
    w = table[distortion_levels]
    if pair_mask is not None:
        w = w * pair_mask
    d2 = jnp.sum((clean_fvs - distorted_fvs) ** 2, axis=1)
    return jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), _EPS)


def _pairwise_masks(batch_labels, sample_mask):
    same = batch_labels[:, None] == batch_labels[None, :]
    valid = sample_mask[:, None] & sample_mask[None, :]
    return same & valid, (~same) & valid


def softmax_triplet_loss(batch_fvs, batch_labels, tau=0.1, sample_mask=None):
    """Hardest-positive/hardest-negative softmax triplet
    (``BatchSoftmaxTripletLoss``, ``losses.py:343-382``): per anchor, p =
    min positive similarity (incl. self), q = max negative; loss =
    ``-log(e^{p/tau} / (e^{p/tau}+e^{q/tau}))`` averaged over the batch."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    pos_mask, neg_mask = _pairwise_masks(batch_labels, sample_mask)
    p = jnp.min(jnp.where(pos_mask, sim, jnp.inf), axis=1)
    q = jnp.max(jnp.where(neg_mask, sim, -jnp.inf), axis=1)
    per = jax.nn.softplus((q - p) / tau)  # == -log(e^{p/t}/(e^{p/t}+e^{q/t}))
    per = jnp.where(sample_mask & jnp.isfinite(q) & jnp.isfinite(p), per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(sample_mask), 1)


def weighted_softmax_triplet_loss(
    batch_fvs, batch_labels, samples_distortion, epoch, num_epochs, tau=0.1, sample_mask=None
):
    """Distortion-weighted hardest triplet (``BatchWeightedSoftmaxTripletLoss``,
    ``losses.py:607-654``), 13-level table, normalized by ``sum(w)``."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_13) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    pos_mask, neg_mask = _pairwise_masks(batch_labels, sample_mask)
    p = jnp.min(jnp.where(pos_mask, sim, jnp.inf), axis=1)
    q = jnp.max(jnp.where(neg_mask, sim, -jnp.inf), axis=1)
    per = jax.nn.softplus((q - p) / tau)
    per = jnp.where(jnp.isfinite(q) & jnp.isfinite(p), per, 0.0)
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)


def weighted_softmax_all_triplet_loss(
    batch_fvs, batch_labels, samples_distortion, epoch, num_epochs, sample_mask=None
):
    """Circle-style soft all-pair triplet (``BatchWeightedSoftmaxAllTripletLoss``,
    ``losses.py:656-691``): distance ``(1-S)/2`` softly re-weighted within
    positives/negatives, then ``log(1+exp(pos-neg))``, 6-level weights."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_6) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    dist = 1.0 - (sim + 1.0) / 2.0
    pos_mask, neg_mask = _pairwise_masks(batch_labels, sample_mask)
    pos_d = jnp.exp(dist) * pos_mask
    neg_d = jnp.exp(-dist) * neg_mask
    pos_w = pos_d / (pos_d.sum(axis=1, keepdims=True) + _EPS)
    neg_w = neg_d / (neg_d.sum(axis=1, keepdims=True) + _EPS)
    pos_loss = jnp.sum(pos_w * dist, axis=1)
    neg_loss = jnp.sum(neg_w * dist, axis=1)
    per = jax.nn.softplus(pos_loss - neg_loss)
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)


def weighted_all_positive_cosine_loss(
    batch_fvs, batch_labels, samples_distortion, epoch, num_epochs, sample_mask=None
):
    """Mean cosine distance to same-class samples (excluding self), weighted
    (``BatchWeightedSoftmaxAllCosineLoss``, ``losses.py:693-728``)."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_6) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    pos_mask, _ = _pairwise_masks(batch_labels, sample_mask)
    num_pos = pos_mask.sum(axis=1) - 1  # reference excludes self from the count
    per = jnp.sum((1.0 - sim) * pos_mask, axis=1) / jnp.maximum(num_pos, 1)
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)


def softmax_all_triplet_loss(
    batch_fvs, batch_labels, samples_distortion, epoch, num_epochs, tau=0.1, sample_mask=None
):
    """All-positive relative softmax vs summed negatives
    (``BatchSoftmaxAllTripletLoss``, ``losses.py:419-464``). Its weight table
    override at ``losses.py:437`` keeps the first six of the *13-level*
    ramps — n_mins (1.0, 0.90, 0.85, 0.80, 0.75, 0.70) — not the 6-level
    table."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_13[:6]) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    s_exp = jnp.exp(sim / tau)
    pos_mask, neg_mask = _pairwise_masks(batch_labels, sample_mask)
    neg_sum = jnp.sum(s_exp * neg_mask, axis=1, keepdims=True)
    rel = -jnp.log(s_exp / (s_exp + neg_sum) + _EPS) * pos_mask
    per = jnp.sum(rel, axis=1) / jnp.maximum(jnp.sum(pos_mask, axis=1), 1)
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)


def multi_level_distortion_loss(batch_fvs, distorted_fvs):
    """Mean cosine distance from each clean embedding to its five distorted
    copies (``BatchDistortionLoss``, ``losses.py:868-883``): ``distorted_fvs``
    carries 6 rows per sample — [clean, level-1..level-5] — and the loss is
    ``mean_i mean_{l=1..5} (1 - <fv_i, d_{i,l}>)``."""
    n = batch_fvs.shape[0]
    groups = distorted_fvs.reshape(n, 6, -1)[:, 1:, :]  # (n, 5, D)
    return jnp.mean(1.0 - jnp.einsum("nd,nkd->nk", batch_fvs, groups))


def instance_loss(batch_fvs):
    """Cosine distance between the two augmented views at even/odd batch
    slots (``BatchInstanceLoss``, ``losses.py:885-894``)."""
    a = batch_fvs[::2]
    b = batch_fvs[1::2]
    return jnp.mean(1.0 - jnp.sum(a * b, axis=1))


def hard_center_triplet_loss(batch_fvs, batch_labels, centers, tau=0.1, sample_mask=None):
    """Hardest-center triplet: p = similarity to own center (min over the
    sample's centers — there is exactly one), q = max over other centers
    (``BatchHardSoftmaxTripletLoss``, ``losses.py:896-925``)."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, centers.T, preferred_element_type=jnp.float32)
    num_centers = centers.shape[0]
    own = jax.nn.one_hot(batch_labels, num_centers, dtype=bool)
    p = jnp.min(jnp.where(own, sim, jnp.inf), axis=1)
    q = jnp.max(jnp.where(~own, sim, -jnp.inf), axis=1)
    per = jax.nn.softplus((q - p) / tau)
    per = jnp.where(sample_mask, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(sample_mask), 1)


def clothes_triplet_loss(batch_fvs, batch_labels, batch_clothes, tau=0.1, sample_mask=None):
    """Clothes-changing triplet: positives are same-id different-clothes
    pairs, hardest each (``BatchSoftmaxClothesTripletLoss``,
    ``losses.py:384-417``); anchors without such a positive are skipped."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    valid = sample_mask[:, None] & sample_mask[None, :]
    same_id = (batch_labels[:, None] == batch_labels[None, :]) & valid
    diff_clothes = batch_clothes[:, None] != batch_clothes[None, :]
    pos_mask = same_id & diff_clothes
    neg_mask = (~same_id) & valid

    p = jnp.min(jnp.where(pos_mask, sim, jnp.inf), axis=1)
    q = jnp.max(jnp.where(neg_mask, sim, -jnp.inf), axis=1)
    ok = sample_mask & jnp.isfinite(p) & jnp.isfinite(q)
    per = jnp.where(ok, jax.nn.softplus((q - p) / tau), 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(ok), 1)


def bipartite_loss(
    batch_fvs, batch_labels, batch_cameras, batch_clothes, samples_distortion,
    epoch, num_epochs, tau=0.1, sample_mask=None, controlled=None,
):
    """Clothes/camera-partitioned relative softmax pair
    (``BatchSoftmaxBipatiteLoss``, ``losses.py:467-547``), 13-level weights.

    Returns (clothes_loss, camera_loss):

    - clothes branch (``losses.py:513-523``): positives are same-identity
      same-camera different-clothes pairs, negatives different-identity
      same-camera pairs.
    - camera branch (``losses.py:529-542``): the reference partitions by
      acquisition setup — its mask ``(cam_j=='controlled') ==
      (cam_i!='controlled')`` keeps exactly the *cross-setup* pairs (one
      controlled, one field). ``controlled`` is that per-sample boolean
      (default all-False, which empties the branch exactly as a batch with
      no 'controlled' cameras does in the reference).
    """
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    if controlled is None:
        controlled = jnp.zeros(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_13) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    s_exp = jnp.exp(sim / tau)
    valid = sample_mask[:, None] & sample_mask[None, :]
    same_id = (batch_labels[:, None] == batch_labels[None, :]) & valid
    same_cam = batch_cameras[:, None] == batch_cameras[None, :]
    same_clothes = batch_clothes[:, None] == batch_clothes[None, :]
    cross_setup = (controlled[None, :] == ~controlled[:, None]) & valid

    def partition_loss(pos_mask, neg_mask):
        pos_sum = jnp.sum(s_exp * pos_mask, axis=1, keepdims=True)
        neg_sum = jnp.sum(s_exp * neg_mask, axis=1, keepdims=True)
        rel = -jnp.log((s_exp * pos_mask + _EPS) / (pos_sum + neg_sum + _EPS)) * pos_mask
        per = jnp.sum(rel, axis=1) / (jnp.sum(pos_mask, axis=1) + _EPS)
        return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)

    clothes_loss = partition_loss(
        same_id & same_cam & ~same_clothes, (~same_id) & valid & same_cam
    )
    camera_loss = partition_loss(same_id & cross_setup, (~same_id) & valid & cross_setup)
    return clothes_loss, camera_loss


def weighted_pose_loss(
    batch_fvs, batch_labels, batch_cameras, batch_clothes, samples_distortion,
    epoch, num_epochs, tau=0.1, sample_mask=None,
):
    """Pose partition: positives same-id same-clothes same-camera
    (``BatchWeightedPoseLoss``, ``losses.py:549-605``), 13-level weights."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    w = _weights_for(samples_distortion, epoch, num_epochs, N_MIN_13) * sample_mask
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    s_exp = jnp.exp(sim / tau)
    valid = sample_mask[:, None] & sample_mask[None, :]
    same_id = (batch_labels[:, None] == batch_labels[None, :]) & valid
    same_cam = batch_cameras[:, None] == batch_cameras[None, :]
    same_clothes = batch_clothes[:, None] == batch_clothes[None, :]

    pos_mask = same_id & same_clothes & same_cam
    neg_mask = ~same_id & same_cam & valid
    pos_sum = jnp.sum(s_exp * pos_mask, axis=1, keepdims=True)
    neg_sum = jnp.sum(s_exp * neg_mask, axis=1, keepdims=True)
    rel = -jnp.log((s_exp * pos_mask + _EPS) / (pos_sum + neg_sum + _EPS)) * pos_mask
    per = jnp.sum(rel, axis=1) / (jnp.sum(pos_mask, axis=1) + _EPS)
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), _EPS)


def controlled_camera_hard_loss(
    batch_fvs, batch_labels, samples_distortion, epoch, num_epochs, tau=0.1, sample_mask=None
):
    """Clean-anchor → per-distortion-level hardest triplets
    (``BatchControlledCameraHardLoss``, ``losses.py:730-791``): for every
    clean sample (distortion 0) and every distortion level d present in its
    class, pair the weakest same-class level-d positive against a hard
    same-level negative, weighted by the 13-level table.

    Exact reference semantics (``losses.py:754-790``): the negatives of a
    clean anchor are the *clean* (same-distortion-as-anchor) samples of other
    classes, sorted by similarity descending; the k-th distortion level
    present in the anchor's class (levels in ascending order) consumes the
    k-th sorted negative. Vectorized over the (anchor, level) grid: rank
    ``k(i,d)`` = number of levels < d present in class(i), ``q(i,d)`` =
    k-th-hardest clean negative of anchor i, ``p(i,d)`` = min similarity to
    same-class level-d samples.
    """
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    valid = sample_mask[:, None] & sample_mask[None, :]
    same_id = (batch_labels[:, None] == batch_labels[None, :]) & valid
    table = distortion_weights(epoch, num_epochs, N_MIN_13)

    is_clean_anchor = (samples_distortion == 0) & sample_mask
    levels = jnp.arange(1, 6)

    # Clean negatives per anchor, sorted descending (losses.py:770-771).
    clean_neg = (~same_id) & valid & (samples_distortion[None, :] == 0)
    neg_sorted = -jnp.sort(jnp.where(clean_neg, -sim, jnp.inf), axis=1)  # (B, B) desc
    n_neg = clean_neg.sum(axis=1)

    # present(i, d): anchor i's class has level-d samples.  (5, B)
    def level_stats(d):
        is_d = (samples_distortion[None, :] == d) & sample_mask[None, :]
        pos = jnp.where(same_id & is_d, sim, jnp.inf)
        return jnp.min(pos, axis=1), (same_id & is_d).any(axis=1)

    p, present = jax.vmap(level_stats)(levels)  # (5, B) each
    rank = jnp.cumsum(present, axis=0) - present  # levels ascending (losses.py:774)
    # q[l, i] = neg_sorted[i, rank[l, i]]
    q = jnp.take_along_axis(
        neg_sorted, jnp.minimum(rank.T, batch_fvs.shape[0] - 1), axis=1
    ).T  # (5, B)
    has = is_clean_anchor[None, :] & present & (rank < n_neg[None, :])
    term = jnp.where(has, jax.nn.softplus((q - p) / tau), 0.0)
    w = jnp.where(has, table[levels][:, None], 0.0)
    return jnp.sum(term * w) / jnp.maximum(jnp.sum(w), _EPS)


def camera_hard_loss(
    batch_fvs, batch_labels, batch_camera_labels, camera_centers,
    center_ids, center_cams, tau=0.1, sample_mask=None,
):
    """Camera-proxy triplets (``BatchCameraHardLoss``, ``losses.py:794-866``):
    each sample pulls toward its identity's *other-camera* centers and
    pushes from the hardest same-camera different-identity center.

    ``camera_centers`` (Nc, D) with per-center identity/camera labels.
    Exact reference semantics (``losses.py:836-863``): per sample, the
    same-camera different-identity centers are sorted by similarity
    descending and each successive positive (the sample's own-identity
    other-camera centers, in center order) consumes the next sorted
    negative, wrapping around when they run out. Assumes (id, camera)
    center pairs are unique, as the epoch miner produces. Returns the mean
    over all counted (sample, other-camera-center) triplets.
    """
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, camera_centers.T, preferred_element_type=jnp.float32)  # (B, Nc)
    same_id = batch_labels[:, None] == center_ids[None, :]
    same_cam = batch_camera_labels[:, None] == center_cams[None, :]

    # positives: own-id centers from other cameras
    pos_mask = same_id & ~same_cam
    # negatives: other-id centers from the sample's own camera
    neg_mask = (~same_id) & same_cam
    n_neg = neg_mask.sum(axis=1)                                        # (B,)
    neg_sorted = -jnp.sort(jnp.where(neg_mask, -sim, jnp.inf), axis=1)  # (B, Nc) desc
    # ordinal of each positive center within its sample's positive list
    # (center-index order, losses.py:844), cycled modulo n_neg (849-855)
    ordinal = jnp.cumsum(pos_mask, axis=1) - 1
    rank = jnp.mod(ordinal, jnp.maximum(n_neg, 1)[:, None])
    q = jnp.take_along_axis(neg_sorted, rank, axis=1)                   # (B, Nc)
    per_pair = jax.nn.softplus((q - sim) / tau)
    counted = pos_mask & (n_neg > 0)[:, None] & sample_mask[:, None]
    total = jnp.sum(jnp.where(counted, per_pair, 0.0))
    return total / jnp.maximum(jnp.sum(counted), 1)


def median_softmax_triplet_loss(batch_fvs, batch_labels, tau=0.1, sample_mask=None):
    """Median-positive/median-negative softmax triplet
    (``BatchMedianSoftmaxTripletLoss``, ``losses.py:927-971``; the reference
    version is buggy — undefined ``batch_pids`` — this is the intended
    computation). Masked medians via sorting with +/-inf padding."""
    if sample_mask is None:
        sample_mask = jnp.ones(batch_fvs.shape[0], dtype=bool)
    sim = jnp.dot(batch_fvs, batch_fvs.T, preferred_element_type=jnp.float32)
    pos_mask, neg_mask = _pairwise_masks(batch_labels, sample_mask)

    def masked_median(values, mask):
        n = mask.sum(axis=1)
        big = jnp.where(mask, values, jnp.inf)
        srt = jnp.sort(big, axis=1)
        # torch.median returns the lower of the two middle elements
        idx = jnp.maximum((n - 1) // 2, 0)
        return jnp.take_along_axis(srt, idx[:, None], axis=1)[:, 0], n > 0

    p, has_p = masked_median(sim, pos_mask)
    q, has_q = masked_median(sim, neg_mask)
    ok = has_p & has_q & sample_mask
    per = jnp.where(ok, jax.nn.softplus((q - p) / tau), 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(ok), 1)
