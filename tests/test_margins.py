"""Margin classifier heads: geometry properties + loss behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu import margins as M


@pytest.fixture
def problem(rng):
    B, D, C = 12, 16, 5
    e = rng.normal(size=(B, D)).astype(np.float32)
    w = rng.normal(size=(D, C)).astype(np.float32)
    y = rng.integers(0, C, B).astype(np.int32)
    return jnp.asarray(e), jnp.asarray(w), jnp.asarray(y)


@pytest.mark.parametrize("kind", ["arcface", "cosface", "amsoftmax"])
def test_additive_margin_penalizes_target(problem, kind):
    e, w, y = problem
    with_margin = np.asarray(M.margin_logits(kind, e, w, y))
    no_margin = np.asarray(M.margin_logits(kind, e, w, y, m=0.0))
    onehot = np.eye(with_margin.shape[1])[np.asarray(y)]
    # additive margins strictly reduce (or keep) the target logit
    assert np.all((with_margin - no_margin)[onehot.astype(bool)] <= 1e-5)
    # and leave non-target logits unchanged
    np.testing.assert_allclose(
        with_margin[~onehot.astype(bool)], no_margin[~onehot.astype(bool)], atol=1e-5
    )


def test_circle_logits_shape_and_sign(problem):
    # circle re-weights rather than shifts: check shape, finiteness, and that
    # a perfectly-aligned target (cos≈1) gets a positive target logit
    e, w, y = problem
    out = np.asarray(M.circle_logits(e, w, y))
    assert out.shape == (e.shape[0], w.shape[1]) and np.isfinite(out).all()
    d = w.shape[0]
    aligned = np.asarray(w).T[:1] * 10.0  # embedding along class-0 weight
    logits = np.asarray(M.circle_logits(jnp.asarray(aligned), w, jnp.asarray([0])))
    assert logits[0, 0] > 0


def test_cosface_margin_exact(problem):
    e, w, y = problem
    logits = np.asarray(M.cosface_logits(e, w, y, s=10.0, m=0.2))
    base = np.asarray(M.cosface_logits(e, w, y, s=10.0, m=0.0))
    onehot = np.eye(logits.shape[1])[np.asarray(y)].astype(bool)
    np.testing.assert_allclose(logits[onehot], base[onehot] - 10.0 * 0.2, atol=1e-5)


def test_margin_loss_decreases_with_alignment(rng):
    # embeddings aligned with their class weight should give lower loss
    D, C = 8, 4
    w = np.eye(D)[:, :C].astype(np.float32)
    aligned = w.T.copy()  # sample i = class i direction
    y = np.arange(C).astype(np.int32)
    shuffled = np.roll(aligned, 1, axis=0)
    for kind in ("arcface", "cosface", "circle"):
        l_good = float(M.margin_softmax_loss(kind, jnp.asarray(aligned), jnp.asarray(w), jnp.asarray(y)))
        l_bad = float(M.margin_softmax_loss(kind, jnp.asarray(shuffled), jnp.asarray(w), jnp.asarray(y)))
        assert l_good < l_bad


def test_margin_loss_masked(problem):
    e, w, y = problem
    mask = jnp.asarray(np.array([True] * 6 + [False] * 6))
    full = M.margin_softmax_loss("cosface", e[:6], w, y[:6])
    masked = M.margin_softmax_loss("cosface", e, w, y, sample_mask=mask)
    assert float(full) == pytest.approx(float(masked), rel=1e-5)


def test_unknown_kind_raises(problem):
    e, w, y = problem
    with pytest.raises(KeyError):
        M.margin_logits("sphereface", e, w, y)


def test_margin_grads_finite(problem):
    e, w, y = problem
    g = jax.grad(lambda e_: M.margin_softmax_loss("arcface", e_, w, y))(e)
    assert np.isfinite(np.asarray(g)).all()


def test_jpm_margin_scale_and_margin_plumbed():
    """--cosine_scale/--cosine_margin (cfg.SOLVER.COSINE_SCALE/COSINE_MARGIN)
    reach the margin math: custom (s, m) change the train-mode logits and
    equal the direct margin_logits computation."""
    import jax
    import jax.numpy as jnp

    from daliid_tpu.margins import margin_logits
    from daliid_tpu.models.transreid_jpm import TransReIDJPM

    def build(**kw):
        m = TransReIDJPM(
            img_size=(32, 16), patch_size=8, patch_stride=8, embed_dim=32,
            depth=2, num_heads=2, num_classes=5, id_loss_type="cosface", **kw,
        )
        v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 16, 3)), train=False)
        return m, v

    m_default, v = build()
    m_custom, _ = build(margin_s=10.0, margin_m=0.1)
    x = jax.random.normal(jax.random.key(1), (4, 32, 16, 3))
    labels = jnp.asarray([0, 1, 2, 3])

    (scores_d, feats_d), _ = m_default.apply(v, x, labels=labels, train=True,
                                             mutable=["batch_stats"])
    (scores_c, _), _ = m_custom.apply(v, x, labels=labels, train=True,
                                      mutable=["batch_stats"])
    assert not np.allclose(np.asarray(scores_d[0]), np.asarray(scores_c[0]))

    # reproduce the custom logits directly from the post-neck global feature
    feat = feats_d[0]
    bn = v["params"]["bottleneck"]
    stats = v["batch_stats"]["bottleneck"]
    # train-mode BN uses the batch statistics
    mu = feat.mean(axis=0)
    var = feat.var(axis=0)
    feat_bn = (feat - mu) / jnp.sqrt(var + 1e-5) * bn["scale"] + bn["bias"]
    expected = margin_logits(
        "cosface", feat_bn, v["params"]["classifier"]["kernel"], labels, s=10.0, m=0.1
    )
    np.testing.assert_allclose(np.asarray(scores_c[0]), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)
