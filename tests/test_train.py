"""Training engine: sampler shapes, proxy mining, LR schedule, full steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.data import make_synthetic_dataset
from daliid_tpu.models.factory import ModelBundle, build_model_pair
from daliid_tpu.models.vit import ViTReID
from daliid_tpu.train import (
    PKBatchSampler,
    Trainer,
    lr_schedule_values,
    mine_proxies_and_centers,
    select_proxies_farthest_point,
)

IMG = (32, 16)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    return make_synthetic_dataset(
        str(root), num_ids=6, imgs_per_id_train=4, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1], with_turbulence=True,
    )


def _tiny_pair():
    m = ViTReID(img_size=IMG, patch_size=8, patch_stride=8, embed_dim=32, depth=1, num_heads=2,
                drop_path_rate=0.0)
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    online = ModelBundle(module=m, variables=v, feature_dim=32, name="tiny")
    momentum = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=32, name="tiny")
    return online, momentum


def test_lr_schedule_three_phases():
    vals = lr_schedule_values(3.5e-4, 250)
    assert vals[0] == vals[99] == pytest.approx(3.5e-4)
    assert vals[100] == vals[199] == pytest.approx(3.5e-5)
    assert vals[200] == vals[249] == pytest.approx(3.5e-6)
    assert len(lr_schedule_values(1e-3, 10)) == 10


def test_sampler_paired_shapes(synth):
    splits, turb = synth
    t = splits["train"]
    s = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=1, turbulence_dir=turb, seed=0)
    batches = list(s.epoch())
    assert len(batches) == s.batches_per_epoch() == 6 // 3
    b = batches[0]
    assert len(b) == 3 * 2 * 2 == s.batch_size
    # pairs adjacent: distortions alternate [0, s, 0, s, ...] with s in 1..5
    assert np.all(b.distortions[0::2] == 0)
    assert np.all((b.distortions[1::2] >= 1) & (b.distortions[1::2] <= 5))
    # pair labels identical
    np.testing.assert_array_equal(b.labels[0::2], b.labels[1::2])
    # clean path and turbulence companion share the stem
    assert "turbstrength" in b.paths[1] and "turbstrength" not in b.paths[0]


def test_sampler_pads_small_classes(synth):
    splits, turb = synth
    t = splits["train"]
    s = PKBatchSampler(t, t.pids, P=2, K=10, kind_of_transform=0, seed=0)
    b = next(iter(s.epoch()))
    assert len(b) == 2 * 10
    # only 4 images per id → 6 padding slots per class
    assert b.mask.sum() == 2 * 4
    # padding slots reuse valid paths (decodable) but are masked
    assert all(p for p in b.paths)


def test_sampler_requires_turbulence_dir(synth):
    splits, _ = synth
    t = splits["train"]
    with pytest.raises(ValueError):
        PKBatchSampler(t, t.pids, kind_of_transform=1, turbulence_dir=None)


def test_farthest_point_selection_spreads(rng):
    # two tight clusters → 2 proxies must hit both clusters
    a = rng.normal(size=(10, 4)) * 0.01
    b = rng.normal(size=(10, 4)) * 0.01 + 10.0
    X = np.concatenate([a, b]).astype(np.float32)
    idx, max_d = select_proxies_farthest_point(X, 2, rng)
    assert (idx[0] < 10) != (idx[1] < 10)
    assert max_d > 10.0


def test_mine_proxies_and_centers_shapes(rng):
    feats = rng.normal(size=(30, 8)).astype(np.float32)
    cls = np.repeat(np.arange(5), 6).astype(np.int32)
    pset = mine_proxies_and_centers(feats, cls, num_classes=5, num_proxies=4, rng=rng)
    assert pset.centers.shape == (5, 8)
    assert pset.proxies.shape == (20, 8)
    np.testing.assert_allclose(np.linalg.norm(pset.centers, axis=1), 1.0, rtol=1e-5)
    assert pset.min_inter > 0.0
    assert (pset.proxy_labels >= 0).all()  # all classes have ≥ num_proxies... padding only when class smaller


def test_trainer_two_epochs_updates_and_ema(synth):
    splits, turb = synth
    t = splits["train"]
    online, momentum = _tiny_pair()
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=1, turbulence_dir=turb, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16, beta=0.9,
    )
    p_before = jax.device_get(trainer.state.params)
    m_before = jax.device_get(trainer.state.momentum_params)
    metrics1 = trainer.train_epoch(1)
    metrics2 = trainer.train_epoch(2)
    assert np.isfinite(metrics1["loss"]) and np.isfinite(metrics2["loss"])
    p_after = jax.device_get(trainer.state.params)
    m_after = jax.device_get(trainer.state.momentum_params)

    def changed(a, b):
        return any(
            not np.allclose(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert changed(p_before, p_after)      # online model trained
    assert changed(m_before, m_after)      # EMA moved
    # EMA trails the online model: momentum != online after training
    assert changed(m_after, p_after)


def test_trainer_ema_beta_zero_tracks_online(synth):
    # beta=0 ⇒ momentum := online after every step (exact EMA semantics)
    splits, turb = synth
    t = splits["train"]
    online, momentum = _tiny_pair()
    sampler = PKBatchSampler(t, t.pids, P=2, K=2, kind_of_transform=0, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16, beta=0.0,
    )
    trainer.train_epoch(1)
    for p, m in zip(
        jax.tree.leaves(jax.device_get(trainer.state.params)),
        jax.tree.leaves(jax.device_get(trainer.state.momentum_params)),
    ):
        np.testing.assert_allclose(p, m, rtol=1e-6)


def test_trainer_sie_camera_conditioning(synth):
    """SIE-conditioned ViTs receive the batch camera ids during training."""
    splits, _ = synth
    t = splits["train"]
    num_cams = int(t.camids.max()) + 1
    m = ViTReID(img_size=IMG, patch_size=8, patch_stride=8, embed_dim=32, depth=1,
                num_heads=2, drop_path_rate=0.0, sie_cameras=num_cams)
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)),
               camera_ids=jnp.zeros(1, jnp.int32), train=False)
    from daliid_tpu.models.factory import ModelBundle

    online = ModelBundle(module=m, variables=v, feature_dim=32, name="sievit")
    momentum = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=32, name="sievit")
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=0, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=2, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16,
    )
    assert trainer._takes_camera_ids
    metrics = trainer.train_epoch(1)
    assert np.isfinite(metrics["loss"])


def test_trainer_classifier_head_model(synth):
    """Models returning (embedding, logits) in train mode (densenet-style,
    Encoders.py:633-637) add the distortion-weighted CE to the loss."""
    import flax.linen as nn

    splits, _ = synth
    t = splits["train"]
    num_classes = t.num_ids

    class TinyClassified(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = jnp.mean(x, axis=(1, 2))
            h = nn.Dense(16, name="proj")(h)
            h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
            if train:
                logits = nn.Dense(num_classes, use_bias=False, name="cls")(h)
                return h, logits
            return h

    m = TinyClassified()
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=True)
    from daliid_tpu.models.factory import ModelBundle

    online = ModelBundle(module=m, variables=v, feature_dim=16, name="tinycls")
    momentum = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=16, name="tinycls")
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=0, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16,
    )
    metrics = trainer.train_epoch(1)
    assert np.isfinite(metrics["loss"])


def _tiny_jpm_pair(num_classes, id_loss_type="softmax"):
    from daliid_tpu.models.transreid_jpm import TransReIDJPM

    m = TransReIDJPM(
        img_size=IMG, patch_size=8, patch_stride=8, embed_dim=32, depth=2,
        num_heads=2, drop_path_rate=0.0, num_classes=num_classes,
        id_loss_type=id_loss_type,
    )
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    online = ModelBundle(module=m, variables=v, feature_dim=5 * 32, name="tinyjpm")
    momentum = ModelBundle(
        module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=5 * 32, name="tinyjpm"
    )
    return online, momentum


def test_trainer_jpm_multibranch(synth):
    """End-to-end JPM training on the mesh: the (scores-list, feats-list)
    train output (make_models.py:351-377) feeds per-branch weighted ID +
    triplet losses plus the center/proxy losses on the concat embedding."""
    splits, turb = synth
    t = splits["train"]
    online, momentum = _tiny_jpm_pair(num_classes=t.num_ids)
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=1, turbulence_dir=turb, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16,
    )
    p_before = jax.device_get(trainer.state.params)
    metrics = trainer.train_epoch(1)
    assert np.isfinite(metrics["loss"]) and metrics["loss"] > 0
    p_after = jax.device_get(trainer.state.params)
    changed = [
        k for k in p_before
        if any(
            not np.allclose(x, y)
            for x, y in zip(jax.tree.leaves(p_before[k]), jax.tree.leaves(p_after[k]))
        )
    ]
    # every branch trains: trunk, b1/b2, all 5 classifiers and necks
    for expected in ("base", "b1_block", "b2_block", "classifier", "classifier_4",
                     "bottleneck", "bottleneck_4"):
        assert expected in changed, (expected, sorted(changed))


@pytest.mark.parametrize("head", ["arcface", "circle"])
def test_trainer_jpm_margin_head(synth, head):
    """Margin heads (make_models.py:260-277) replace the global softmax
    classifier; the labels are plumbed into the model forward."""
    splits, _ = synth
    t = splits["train"]
    online, momentum = _tiny_jpm_pair(num_classes=t.num_ids, id_loss_type=head)
    sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=0, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16,
    )
    assert trainer._takes_labels
    p_before = jax.device_get(trainer.state.params)
    metrics = trainer.train_epoch(1)
    assert np.isfinite(metrics["loss"])
    p_after = jax.device_get(trainer.state.params)
    assert not np.allclose(
        jax.tree.leaves(p_before["classifier"])[0], jax.tree.leaves(p_after["classifier"])[0]
    )


def test_mining_quantize_int8(synth):
    """--mining_quantize int8 (VERDICT r3 item 8): the per-epoch mining
    re-embedding runs PTQ while validation extraction stays fp. The mined
    set must stay within the protocol's tolerance of the fp mining: centers
    cosine-close, proxy slots mostly identical selections, diagnostics in
    band — and a subsequent epoch trains to a loss close to the fp-mined
    one (identical batches; only proxies/centers differ)."""
    from daliid_tpu.models.resnet import ResNet50ReID

    splits, _ = synth
    t = splits["train"]

    def resnet_pair():
        m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
        v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
        online = ModelBundle(module=m, variables=v, feature_dim=2048, name="tinyr")
        mom = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v),
                          feature_dim=2048, name="tinyr")
        return online, mom

    def make_trainer(**kw):
        on, mo = resnet_pair()
        sampler = PKBatchSampler(t, t.pids, P=3, K=2, kind_of_transform=0, seed=0)
        return Trainer(on, mo, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
                       compute_dtype=jnp.float32, extractor_batch=16, **kw)

    tr_fp = make_trainer()
    tr_q = make_trainer(mining_quantize="int8", mining_calib_batches=2)
    assert tr_q._mining_extractor is not None
    assert tr_q._mining_extractor is not tr_q.extractor
    assert tr_q.extractor.quantize is None  # validation extraction stays fp

    p_fp = tr_fp.mine_proxies()
    p_q = tr_q.mine_proxies()
    assert tr_q._mining_extractor.quant_scales is not None

    # centers: same class structure, tight cosine band
    cos_c = np.sum(p_fp.centers * p_q.centers, axis=1)
    assert cos_c.min() > 0.995, cos_c.min()
    np.testing.assert_array_equal(p_fp.proxy_labels, p_q.proxy_labels)
    # proxies: farthest-point selection may flip a slot under int8 noise,
    # but most selections must survive (rows are L2-normalized features)
    cos_p = np.sum(p_fp.proxies * p_q.proxies, axis=1)
    valid = p_fp.proxy_labels >= 0
    assert (cos_p[valid] > 0.995).mean() >= 0.8, cos_p[valid]
    assert abs(p_fp.mean_max_intra - p_q.mean_max_intra) < 0.05
    assert abs(p_fp.min_inter - p_q.min_inter) < 0.05

    # epoch-level: same batches, int8-mined proxies → loss within a few %
    m_fp = tr_fp.train_epoch(1)
    m_q = tr_q.train_epoch(1)
    assert np.isfinite(m_q["loss"])
    assert m_q["loss"] == pytest.approx(m_fp["loss"], rel=0.05), (m_fp, m_q)

    # next epoch recalibrates on the new weights (scales dropped on update)
    tr_q.mine_proxies()
    assert tr_q._mining_extractor.quant_scales is not None


def test_trainer_lr_applied(synth):
    splits, turb = synth
    t = splits["train"]
    online, momentum = _tiny_pair()
    sampler = PKBatchSampler(t, t.pids, P=2, K=2, kind_of_transform=0, seed=0)
    trainer = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=250, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16,
    )
    lr1 = trainer.set_epoch_hyperparams(1)
    lr150 = trainer.set_epoch_hyperparams(150)
    lr249 = trainer.set_epoch_hyperparams(249)
    assert lr1 == pytest.approx(1e-3)
    assert lr150 == pytest.approx(1e-4)
    assert lr249 == pytest.approx(1e-5)


def _fresh_trainer(synth, *, grad_accum, kind_of_transform=0, seed=12, K=4, P=3):
    splits, turb = synth
    t = splits["train"]
    online, momentum = _tiny_pair()
    sampler = PKBatchSampler(
        t, t.pids, P=P, K=K, kind_of_transform=kind_of_transform,
        turbulence_dir=turb if kind_of_transform == 1 else None, seed=0,
    )
    return Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=4, base_lr=1e-3,
        compute_dtype=jnp.float32, extractor_batch=16, seed=seed,
        grad_accum=grad_accum,
    )


def _ln_pair():
    """BN-free tiny model: grad-accum equivalence is only exact without
    BatchNorm (BN train-mode stats are per-microbatch — torch semantics)."""
    import flax.linen as nn

    class TinyLN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = jnp.mean(x, axis=(1, 2))
            h = nn.Dense(16, name="proj")(h)
            return nn.LayerNorm(name="ln")(h)

    m = TinyLN()
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    online = ModelBundle(module=m, variables=v, feature_dim=16, name="tinyln")
    momentum = ModelBundle(module=m, variables=jax.tree.map(jnp.copy, v),
                           feature_dim=16, name="tinyln")
    return online, momentum


def test_grad_accum_matches_full_batch(synth):
    """grad_accum=N reproduces the full-batch GRADIENT (modulo f32
    reassociation) when the per-sample loss weights are uniform — clean
    batches (all distortion 0), no padding (K=4 = imgs/id) — and the model
    is BN-free (every zoo model carries a BN neck whose train-mode stats
    are computed per-microbatch, the standard torch grad-accum semantics;
    a BN run diverges by design — see test_grad_accum_bn_microbatch_stats).

    Asserted on the pre-update loss and on the Adam moments (mu linear in
    g, nu quadratic) rather than on post-step params: the first Adam
    update is ~lr*sign(g), so reassociation noise on near-zero grads flips
    update signs — the same cross-run chaos the composed-pipeline oracle
    documents. P=6 puts the whole epoch in ONE batch so both steps see
    identical incoming params."""
    splits, _ = synth
    t = splits["train"]
    sampler = lambda: PKBatchSampler(t, t.pids, P=6, K=4, kind_of_transform=0, seed=0)

    def mk(ga):
        on, mo = _ln_pair()
        return Trainer(on, mo, sampler(), img_size=IMG, num_epochs=4,
                       base_lr=1e-3, compute_dtype=jnp.float32,
                       extractor_batch=16, seed=12, grad_accum=ga)

    tr1, tr2 = mk(1), mk(3)
    m1 = tr1.train_epoch(1)
    m2 = tr2.train_epoch(1)
    assert m2["loss"] == pytest.approx(m1["loss"], rel=1e-5)
    assert m2["center_loss"] == pytest.approx(m1["center_loss"], rel=1e-5)
    assert m2["proxy_loss"] == pytest.approx(m1["proxy_loss"], rel=1e-5)
    o1 = jax.device_get(tr1.state.opt_state)
    o2 = jax.device_get(tr2.state.opt_state)
    leaves1, leaves2 = jax.tree.leaves(o1), jax.tree.leaves(o2)
    assert len(leaves1) == len(leaves2) and len(leaves1) > 0
    for a, b in zip(leaves1, leaves2):
        if np.asarray(a).dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-7)


def test_grad_accum_bn_microbatch_stats(synth):
    """BN-neck models microbatch with per-chunk batch stats threading
    sequentially through the scan (torch grad-accum semantics): the run is
    finite and the running stats MOVE (the scan carry is threaded out)."""
    tr = _fresh_trainer(synth, grad_accum=2)  # ViTReID: has a BN neck
    s_before = jax.device_get(tr.state.batch_stats)
    metrics = tr.train_epoch(1)
    assert np.isfinite(metrics["loss"])
    s_after = jax.device_get(tr.state.batch_stats)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(s_before), jax.tree.leaves(s_after))
    )


def test_grad_accum_paired_at_batches(synth):
    """Paired AT batches microbatch cleanly when chunks stay even (pairs are
    adjacent [clean, distorted] slots and must not split across chunks)."""
    tr = _fresh_trainer(synth, grad_accum=2, kind_of_transform=1, K=2)
    metrics = tr.train_epoch(1)
    assert np.isfinite(metrics["loss"])


def test_grad_accum_validation(synth):
    with pytest.raises(ValueError, match="grad_accum"):
        _fresh_trainer(synth, grad_accum=0)
    # batch 12 (P=3, K=4) pads to 16 on the 8-device mesh: 5 does not
    # divide it -> trace-time error
    tr = _fresh_trainer(synth, grad_accum=5)
    with pytest.raises(ValueError, match="divide the batch"):
        tr.train_epoch(1)
    # paired batch 20 (P=5, K=2, x2) pads to 24 = 12 pairs; n=8 does not
    # divide the pair count, so a chunk would split a [clean, distorted]
    # pair
    tr = _fresh_trainer(synth, grad_accum=8, kind_of_transform=1, K=2, P=5)
    with pytest.raises(ValueError, match="pair count"):
        tr.train_epoch(1)


def test_grad_accum_padded_batch_matches_full_batch(synth):
    """Chunk recombination is weighted by valid-slot counts, so masked
    padding slots (mesh-multiple padding, <K-image identities) do NOT
    rescale the gradient: grad_accum=2 on a batch that pads 12 -> 16 on
    the 8-device mesh still reproduces the full-batch Adam moments
    (review finding r5)."""
    splits, _ = synth
    t = splits["train"]
    sampler = lambda: PKBatchSampler(t, t.pids, P=3, K=4, kind_of_transform=0, seed=0)

    def mk(ga):
        on, mo = _ln_pair()
        return Trainer(on, mo, sampler(), img_size=IMG, num_epochs=4,
                       base_lr=1e-3, compute_dtype=jnp.float32,
                       extractor_batch=16, seed=12, grad_accum=ga)

    tr1, tr2 = mk(1), mk(2)
    m1 = tr1.train_epoch(1)
    m2 = tr2.train_epoch(1)
    # 2 batches/epoch; the first step's loss is computed on identical params
    assert np.isfinite(m2["loss"])
    o1 = jax.device_get(tr1.state.opt_state)
    o2 = jax.device_get(tr2.state.opt_state)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        if np.asarray(a).dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-7)


def test_grad_accum_strided_chunks_keep_negatives():
    """Chunk slots stride across the identity-grouped PK layout, so every
    microbatch mixes identities and the triplet losses keep non-empty
    negative pools (review finding r5: a contiguous assignment hands a
    chunk a single identity — e.g. P=16, K=12, grad_accum=16 → 12-slot
    chunks inside one 12-image identity block — silently zeroing the
    hardest-triplet term)."""
    from daliid_tpu.train.trainer import microbatch_slots

    # unpaired PK layout: P identities x K consecutive slots each
    P_, K_ = 4, 6
    labels = np.repeat(np.arange(P_), K_)
    slots = microbatch_slots(P_ * K_, K_, paired=False)  # mb = P_ slots
    assert slots.shape == (K_, P_)
    for c in range(K_):
        assert len(np.unique(labels[slots[c]])) == P_  # every identity present
    # paired layout: pairs adjacent, pair identities grouped
    pair_labels = np.repeat(np.arange(4), 2 * 2)  # P=4, K=2, x2 slots
    slots_p = microbatch_slots(16, 2, paired=True)
    for c in range(2):
        chunk = slots_p[c]
        # pairs stay adjacent: even positions are the clean slot of a pair
        assert np.all(chunk[1::2] == chunk[0::2] + 1)
        assert len(np.unique(pair_labels[chunk])) == 4
    # permutation property: every slot exactly once
    np.testing.assert_array_equal(np.sort(slots_p.ravel()), np.arange(16))
    np.testing.assert_array_equal(np.sort(slots.ravel()), np.arange(24))
