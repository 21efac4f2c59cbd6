"""Machine-checked parity: every loss vs the reference's own torch code.

The installed torch (CPU) runs ``/root/reference/Person-ReID/losses.py``
directly — the literal reference implementation is the oracle here, not a
re-derived numpy loop. ``.cuda()`` is monkeypatched to identity (the only
CUDA dependency). Each test feeds IDENTICAL float32 inputs to both sides
across random PK-style batches, multiple epochs, ragged class sizes, and
all distortion levels; the masked/padded variants additionally prove the
static-shape claims (proxy padding, sample masks) against the reference's
ragged computation.
"""

from __future__ import annotations

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

import daliid_tpu.losses as L

REF_DIR = "/root/reference/Person-ReID"


@pytest.fixture(scope="module")
def ref():
    try:
        import termcolor  # noqa: F401
    except ImportError:
        sys.modules["termcolor"] = types.SimpleNamespace(colored=lambda s, *a, **k: s)
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import losses as reference_losses

    return reference_losses


@pytest.fixture(scope="module")
def torch_mod(ref):
    import torch

    return torch


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _fvs(rng, n, d=16):
    return _normalize(rng.normal(size=(n, d))).astype(np.float32)


def _pk_labels(rng, n_classes, k):
    """Each class appears exactly k times (PK batch), shuffled."""
    labels = np.repeat(np.arange(n_classes), k)
    rng.shuffle(labels)
    return labels.astype(np.int64)


EPOCHS = [0, 3, 17, 25]
N_EPOCHS = 25


def _close(a, b, rtol=1e-4, atol=1e-5):
    assert float(a) == pytest.approx(float(b), rel=rtol, abs=atol), (float(a), float(b))


# ---------------------------------------------------------------- schedule


def test_cosine_schedule(ref):
    for t in range(0, 26, 5):
        for n_min in (0.0, 0.1, 0.4, 0.8):
            mine = float(L.cosine_schedule_value(t, 25, n_min=n_min))
            theirs = float(ref.getValueFromCosineSchedule(t, 25, n_min=n_min))
            _close(mine, theirs, rtol=1e-6, atol=1e-7)


def test_distortion_weight_tables(ref, torch_mod):
    for epoch in EPOCHS:
        w6 = np.asarray(L.distortion_weights(epoch, N_EPOCHS, L.N_MIN_6))
        ref6 = [1.0] + [
            ref.getValueFromCosineSchedule(epoch, N_EPOCHS, n_min=m)
            for m in (0.8, 0.6, 0.4, 0.2, 0.1)
        ]
        np.testing.assert_allclose(w6, ref6, rtol=1e-6)
        w13 = np.asarray(L.distortion_weights(epoch, N_EPOCHS, L.N_MIN_13))
        ref13 = [1.0] + [
            ref.getValueFromCosineSchedule(epoch, N_EPOCHS, n_min=m)
            for m in (0.9, 0.85, 0.8, 0.75, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.1)
        ]
        np.testing.assert_allclose(w13, ref13, rtol=1e-6)


def test_balanced_accuracy_vs_getACCBal(ref, rng):
    for _ in range(5):
        pred = rng.integers(0, 8, 40)
        gt = rng.integers(2, 10, 40)  # predicted-only and gt-only labels both occur
        _close(L.balanced_accuracy_host(pred, gt), ref.getACCBal(pred, gt), rtol=1e-9)


# ------------------------------------------------------------ center losses


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_center_loss(ref, torch_mod, rng, epoch):
    B, C, D = 24, 6, 16
    fvs = _fvs(rng, B, D)
    labels = _pk_labels(rng, C, 4)
    dist = rng.integers(0, 6, B)
    centers = _fvs(rng, C, D)

    loss, aux = L.weighted_center_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), jnp.asarray(centers),
        epoch, N_EPOCHS, tau=0.1,
    )
    t = torch_mod
    rl, racc, rprob = ref.BatchWeightedCenterLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(dist), t.tensor(centers),
        np.arange(C), epoch, N_EPOCHS, False, tau=0.1,
    )
    _close(loss, rl)
    _close(aux["avg_max_prob"], rprob)
    # diagnostic parity: both the host helper and the ON-DEVICE aux must
    # reproduce getACCBal (union-of-label-sets denominator)
    _close(L.balanced_accuracy_host(np.asarray(aux["predicted"]), labels), racc, rtol=1e-6)
    _close(aux["batch_acc_bal"], racc, rtol=1e-5)


def test_weighted_center_loss_masked_padding(ref, torch_mod, rng):
    """Padded batch + sample_mask == reference on the unpadded batch."""
    B, C, D, PAD = 20, 5, 16, 8
    fvs = _fvs(rng, B, D)
    labels = _pk_labels(rng, C, 4)
    dist = rng.integers(0, 6, B)
    centers = _fvs(rng, C, D)

    fvs_p = np.concatenate([fvs, _fvs(rng, PAD, D)])
    labels_p = np.concatenate([labels, rng.integers(0, C, PAD)])
    dist_p = np.concatenate([dist, rng.integers(0, 6, PAD)])
    mask = np.concatenate([np.ones(B, bool), np.zeros(PAD, bool)])

    loss, _ = L.weighted_center_loss(
        jnp.asarray(fvs_p), jnp.asarray(labels_p), jnp.asarray(dist_p),
        jnp.asarray(centers), 5, N_EPOCHS, tau=0.1, sample_mask=jnp.asarray(mask),
    )
    t = torch_mod
    rl, _, _ = ref.BatchWeightedCenterLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(dist), t.tensor(centers),
        np.arange(C), 5, N_EPOCHS, False, tau=0.1,
    )
    _close(loss, rl)


def test_center_loss(ref, torch_mod, rng):
    B, C, D = 18, 6, 16
    fvs, labels, centers = _fvs(rng, B, D), _pk_labels(rng, C, 3), _fvs(rng, C, D)
    mine = L.center_loss(jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(centers), tau=0.1)
    t = torch_mod
    theirs = ref.BatchCenterLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(centers), np.arange(C), tau=0.1
    )
    _close(mine, theirs)


def test_l2_center_loss(ref, torch_mod, rng):
    B, C, D = 18, 6, 16
    fvs, labels, centers = _fvs(rng, B, D), _pk_labels(rng, C, 3), _fvs(rng, C, D)
    mine = L.l2_center_loss(jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(centers))
    t = torch_mod
    theirs = ref.BatchL2CenterLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(centers), np.arange(C)
    )
    _close(mine, theirs)


def test_hard_center_triplet_loss(ref, torch_mod, rng):
    B, C, D = 18, 6, 16
    fvs, labels, centers = _fvs(rng, B, D), _pk_labels(rng, C, 3), _fvs(rng, C, D)
    mine = L.hard_center_triplet_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(centers), tau=0.1
    )
    t = torch_mod
    theirs = ref.BatchHardSoftmaxTripletLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(centers), np.arange(C), tau=0.1
    )
    _close(mine, theirs)


# ------------------------------------------------------------- proxy losses


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_proxy_loss_ragged_counts(ref, torch_mod, rng, epoch):
    """Static-top-k + mask == the reference's ragged per-sample top-k
    (the equivalence claim at daliid_tpu/losses.py weighted_proxy_loss)."""
    B, C, D = 24, 6, 16
    fvs = _fvs(rng, B, D)
    labels = _pk_labels(rng, C, 4)
    dist = rng.integers(0, 6, B)
    # ragged: class c owns 1..5 proxies
    counts = rng.integers(1, 6, C)
    proxy_labels = np.concatenate([np.full(k, c) for c, k in enumerate(counts)])
    proxies = _fvs(rng, len(proxy_labels), D)
    # padding slots (label -1) to a static size, shuffled in
    PAD = 7
    proxies_p = np.concatenate([proxies, _fvs(rng, PAD, D)])
    labels_p = np.concatenate([proxy_labels, np.full(PAD, -1)])
    perm = rng.permutation(len(labels_p))

    mine = L.weighted_proxy_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist),
        jnp.asarray(proxies_p[perm]), jnp.asarray(labels_p[perm]),
        epoch, N_EPOCHS, tau=0.1,
    )
    t = torch_mod
    theirs = ref.BatchWeightedProxyLoss(
        t.tensor(fvs), t.tensor(labels), dist.astype(np.int64),
        t.tensor(proxies), proxy_labels.astype(np.float32), epoch, N_EPOCHS, tau=0.1,
    )
    _close(mine, theirs)


def test_proxy_loss(ref, torch_mod, rng):
    B, C, D, TOPN = 18, 6, 16, 8
    fvs = _fvs(rng, B, D)
    labels = _pk_labels(rng, C, 3)
    proxy_labels = np.repeat(np.arange(C), 3)
    proxies = _fvs(rng, len(proxy_labels), D)
    mine = L.proxy_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(proxies),
        jnp.asarray(proxy_labels), top_negs=TOPN, tau=0.1,
    )
    t = torch_mod
    # proxies_labels must be a torch tensor: with a raw numpy array the
    # reference's `proxies_labels != pseudo_label` (losses.py:256) degrades
    # to scalar True and selects ALL proxies as negatives — the tensor form
    # (what its own BatchWeightedProxyLoss builds at losses.py:289) carries
    # the intended semantics.
    theirs = ref.BatchProxyLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(proxies),
        t.tensor(proxy_labels.astype(np.float32)), top_negs=TOPN, tau=0.1,
    )
    _close(mine, theirs)


# ------------------------------------------------------- cross entropy / CE


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_cross_entropy_loss(ref, torch_mod, rng, epoch):
    B, C = 24, 10
    logits = rng.normal(size=(B, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.integers(0, C, B)
    dist = rng.integers(0, 13, B)
    mine, prob = L.weighted_cross_entropy_loss(
        jnp.asarray(probs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS
    )
    t = torch_mod
    theirs, _, rprob = ref.BatchWeightedCrossEntropyLoss(
        t.tensor(probs), t.tensor(labels.astype(np.float32)), dist.astype(np.int64),
        {c: c for c in range(C)}, epoch, N_EPOCHS,
    )
    _close(mine, theirs)
    _close(prob, rprob)


# -------------------------------------------------------- distortion losses


@pytest.mark.parametrize("epoch", EPOCHS)
def test_paired_distortion_loss(ref, torch_mod, rng, epoch):
    """One clean + one distorted copy per present level per class makes the
    reference's random re-pairing deterministic (arange path) and its
    per-(class,level) group mean equal to the per-pair weighted mean."""
    C, D = 6, 16
    clean, dist_fv, levels, batch, blabels, bdist = [], [], [], [], [], []
    for c in range(C):
        cfv = _fvs(rng, 1, D)[0]
        batch.append(cfv), blabels.append(c), bdist.append(0)
        for lv in sorted(rng.choice(np.arange(1, 13), size=rng.integers(1, 4), replace=False)):
            dfv = _fvs(rng, 1, D)[0]
            clean.append(cfv), dist_fv.append(dfv), levels.append(lv)
            batch.append(dfv), blabels.append(c), bdist.append(lv)
    mine = L.paired_distortion_loss(
        jnp.asarray(np.stack(clean)), jnp.asarray(np.stack(dist_fv)),
        jnp.asarray(np.asarray(levels)), epoch, N_EPOCHS,
    )
    t = torch_mod
    theirs = ref.distortionLoss(
        t.tensor(np.stack(batch)), t.tensor(np.asarray(blabels)),
        np.asarray(bdist, dtype=np.int64), epoch, N_EPOCHS,
    )
    _close(mine, theirs)


def test_multi_level_distortion_loss(ref, torch_mod, rng):
    n, D = 7, 16
    fvs = _fvs(rng, n, D)
    distorted = _fvs(rng, 6 * n, D)
    mine = L.multi_level_distortion_loss(jnp.asarray(fvs), jnp.asarray(distorted))
    t = torch_mod
    theirs = ref.BatchDistortionLoss(t.tensor(fvs), t.tensor(distorted))
    _close(mine, theirs)


def test_instance_loss(ref, torch_mod, rng):
    fvs = _fvs(rng, 16, 16)
    mine = L.instance_loss(jnp.asarray(fvs))
    theirs = ref.BatchInstanceLoss(torch_mod.tensor(fvs))
    _close(mine, theirs)


# --------------------------------------------------------- triplet family


def test_softmax_triplet_loss(ref, torch_mod, rng):
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    mine = L.softmax_triplet_loss(jnp.asarray(fvs), jnp.asarray(labels), tau=0.1)
    t = torch_mod
    theirs, _, _ = ref.BatchSoftmaxTripletLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(labels), tau=0.1
    )
    _close(mine, theirs)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_softmax_triplet_loss(ref, torch_mod, rng, epoch):
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    dist = rng.integers(0, 13, B)
    mine = L.weighted_softmax_triplet_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS, tau=0.1
    )
    t = torch_mod
    theirs = ref.BatchWeightedSoftmaxTripletLoss(
        t.tensor(fvs), t.tensor(labels), dist.astype(np.int64), epoch, N_EPOCHS, tau=0.1
    )
    _close(mine, theirs)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_softmax_all_triplet_loss(ref, torch_mod, rng, epoch):
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    dist = rng.integers(0, 6, B)
    mine = L.weighted_softmax_all_triplet_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS
    )
    t = torch_mod
    theirs = ref.BatchWeightedSoftmaxAllTripletLoss(
        t.tensor(fvs), t.tensor(labels), dist.astype(np.int64), epoch, N_EPOCHS
    )
    _close(mine, theirs)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_all_positive_cosine_loss(ref, torch_mod, rng, epoch):
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    dist = rng.integers(0, 6, B)
    mine = L.weighted_all_positive_cosine_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS
    )
    t = torch_mod
    theirs = ref.BatchWeightedSoftmaxAllCosineLoss(
        t.tensor(fvs), t.tensor(labels), dist.astype(np.int64), epoch, N_EPOCHS
    )
    _close(mine, theirs)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_softmax_all_triplet_loss(ref, torch_mod, rng, epoch):
    # tau=0.5: the only formula difference is our log-underflow guard
    # (+1e-9 inside the log); at tau=0.1 the reference's guardless ratio can
    # reach ~1e-10 where the guard dominates — not a semantics difference.
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    dist = rng.integers(0, 6, B)
    mine = L.softmax_all_triplet_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS, tau=0.5
    )
    t = torch_mod
    theirs = ref.BatchSoftmaxAllTripletLoss(
        t.tensor(fvs), t.tensor(labels), dist.astype(np.int64), epoch, N_EPOCHS, tau=0.5
    )
    _close(mine, theirs)


def test_clothes_triplet_loss(ref, torch_mod, rng):
    B, D = 24, 16
    fvs = _fvs(rng, B, D)
    labels = np.repeat(np.arange(6), 4)
    clothes = np.tile([0, 0, 1, 1], 6)
    mine = L.clothes_triplet_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(clothes), tau=0.1
    )
    t = torch_mod
    theirs = ref.BatchSoftmaxClothesTripletLoss(
        t.tensor(fvs), t.tensor(labels), t.tensor(clothes), tau=0.1
    )
    _close(mine, theirs)


def test_median_softmax_triplet_loss(ref, torch_mod, rng):
    B, D = 24, 16
    fvs, labels = _fvs(rng, B, D), _pk_labels(rng, 6, 4)
    mine = L.median_softmax_triplet_loss(jnp.asarray(fvs), jnp.asarray(labels), tau=0.1)
    t = torch_mod
    # the reference references an undefined module-global `batch_pids`
    # (losses.py:938) — inject it so the otherwise-intact math runs
    ref.batch_pids = t.tensor(labels)
    try:
        theirs, _, _ = ref.BatchMedianSoftmaxTripletLoss(
            t.tensor(fvs), t.tensor(labels), tau=0.1
        )
    finally:
        del ref.batch_pids
    _close(mine, theirs)


# ------------------------------------------- partitioned / camera families


@pytest.mark.parametrize("epoch", EPOCHS)
def test_bipartite_loss(ref, torch_mod, rng, epoch):
    B, D = 24, 16
    fvs = _fvs(rng, B, D)
    labels = np.repeat(np.arange(6), 4)
    cam_names = np.tile(np.array(["controlled", "field1", "controlled", "field2"]), 6)
    clothes = np.tile([0, 1, 1, 0], 6)
    dist = rng.integers(0, 13, B)

    cams_int = np.unique(cam_names, return_inverse=True)[1]
    mine_cl, mine_cam = L.bipartite_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(cams_int),
        jnp.asarray(clothes), jnp.asarray(dist), epoch, N_EPOCHS, tau=0.1,
        controlled=jnp.asarray(cam_names == "controlled"),
    )
    t = torch_mod
    ref_cl, ref_cam = ref.BatchSoftmaxBipatiteLoss(
        t.tensor(fvs), t.tensor(labels), cam_names, clothes,
        t.tensor(dist), epoch, N_EPOCHS, tau=0.1,
    )
    _close(mine_cl, ref_cl)
    _close(mine_cam, ref_cam)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_weighted_pose_loss(ref, torch_mod, rng, epoch):
    B, D = 24, 16
    fvs = _fvs(rng, B, D)
    labels = np.repeat(np.arange(6), 4)
    cams = np.tile([0, 0, 1, 1], 6)
    clothes = np.tile([0, 1, 0, 1], 6)
    dist = rng.integers(0, 13, B)
    mine = L.weighted_pose_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(cams),
        jnp.asarray(clothes), jnp.asarray(dist), epoch, N_EPOCHS, tau=0.1,
    )
    t = torch_mod
    theirs = ref.BatchWeightedPoseLoss(
        t.tensor(fvs), t.tensor(labels), cams, clothes, t.tensor(dist),
        epoch, N_EPOCHS, tau=0.1,
    )
    _close(mine, theirs)


@pytest.mark.parametrize("epoch", EPOCHS)
def test_controlled_camera_hard_loss(ref, torch_mod, rng, epoch):
    """Sorted-clean-negative walk (the 'exactly equivalent' docstring claim)
    against the literal reference, with multiple levels per class so the
    per-level negative rank actually advances."""
    C, D = 5, 16
    fvs_l, labels, dist = [], [], []
    for c in range(C):
        n_clean = int(rng.integers(1, 3))
        for _ in range(n_clean):
            labels.append(c), dist.append(0)
        for lv in sorted(rng.choice(np.arange(1, 6), size=rng.integers(1, 4), replace=False)):
            labels.append(c), dist.append(int(lv))
    B = len(labels)
    fvs = _fvs(rng, B, D)
    labels, dist = np.asarray(labels), np.asarray(dist, dtype=np.int64)

    mine = L.controlled_camera_hard_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(dist), epoch, N_EPOCHS, tau=0.1
    )
    t = torch_mod
    theirs = ref.BatchControlledCameraHardLoss(
        t.tensor(fvs), t.tensor(labels), dist, epoch, N_EPOCHS, tau=0.1
    )
    _close(mine, theirs)


def test_camera_hard_loss(ref, torch_mod, rng):
    """Negative-cycling parity: the reference walks sorted same-camera
    negatives, one per positive camera, wrapping around."""
    D = 16
    ids = np.repeat(np.arange(4), 4)
    cams = np.tile([0, 1, 2, 3], 4)  # unique (id, cam) centers
    centers = _fvs(rng, len(ids), D)

    B = 20
    fvs = _fvs(rng, B, D)
    labels = rng.integers(0, 4, B)
    cam_labels = rng.integers(0, 4, B)

    mine = L.camera_hard_loss(
        jnp.asarray(fvs), jnp.asarray(labels), jnp.asarray(cam_labels),
        jnp.asarray(centers), jnp.asarray(ids), jnp.asarray(cams), tau=0.1,
    )
    t = torch_mod
    # the reference's center-label table mixes string ids with the camera
    # values compared via .item() — an object array reproduces its indexing
    table = np.array([[str(i), int(c)] for i, c in zip(ids, cams)], dtype=object)
    theirs = ref.BatchCameraHardLoss(
        t.tensor(fvs), t.tensor(labels.astype(np.float32)), t.tensor(cam_labels),
        t.tensor(centers), table, None, 5, N_EPOCHS, tau=0.1,
    )
    _close(mine, theirs)
