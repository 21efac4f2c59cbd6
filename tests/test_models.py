"""Backbone models: shapes, BN train/eval semantics, torch-port parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.models import build_model_pair, get_model
from daliid_tpu.models.resnet import ResNet50ReID
from daliid_tpu.models.torch_port import (
    resnet50_reid_from_torch,
    resnet50_reid_to_torch_keys,
    strip_module_prefix,
)
from daliid_tpu.models.vit import ViTReID, resize_pos_embed


IMG = (64, 32)  # small spatial size for fast tests


def test_resnet50_shapes():
    bundle = get_model("resnet50", jax.random.key(0), img_size=IMG)
    x = jnp.zeros((2, *IMG, 3))
    out = bundle.apply_eval(x)
    assert out.shape == (2, 2048)
    # last-stride-1: with input 64x32 the final feature map is 4x2 (not 2x1)


def test_resnet50_last_stride():
    # Capture the trunk output spatial dims via intermediates: feature map
    # should be input/16 (not /32) thanks to last-stride-1 (Encoders.py:321-322).
    m = ResNet50ReID()
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    _, inter = m.apply(v, jnp.zeros((1, *IMG, 3)), train=False, capture_intermediates=True)
    feats = inter["intermediates"]["layer4_2"]["__call__"][0]
    assert feats.shape[1:3] == (IMG[0] // 16, IMG[1] // 16)


def test_resnet50_feature_map_mode(rng):
    from daliid_tpu.models.resnet import ResNet50ReID

    m = ResNet50ReID(return_feature_map=True)
    x = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    fmap, emb = m.apply(v, x, train=False)
    assert emb.shape == (2, 2048)
    assert fmap.shape == (2, IMG[0] // 16, IMG[1] // 16, 2048)


def test_resnet50_pooling_modes(rng):
    x = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    out = {}
    for feature in ("gap", "gmp", "both"):
        m = ResNet50ReID(feature=feature)
        v = m.init({"params": jax.random.key(1)}, x, train=False)
        out[feature] = m.apply(v, x, train=False)
    # with identical weights and fresh BN stats (mean 0, var 1), both = gap+gmp
    np.testing.assert_allclose(
        np.asarray(out["both"]), np.asarray(out["gap"] + out["gmp"]), rtol=1e-4, atol=1e-4
    )


def test_model_pair_synced():
    online, momentum = build_model_pair("resnet50", jax.random.key(0), img_size=IMG)
    leaves_o = jax.tree.leaves(online.variables)
    leaves_m = jax.tree.leaves(momentum.variables)
    for a, b in zip(leaves_o, leaves_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_train_updates_stats(rng):
    m = ResNet50ReID()
    x = jnp.asarray(rng.normal(size=(4, *IMG, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    _, updates = m.apply(v, x, train=True, mutable=["batch_stats"])
    before = v["batch_stats"]["bn1"]["mean"]
    after = updates["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vit_shapes_and_tokens():
    m = ViTReID(img_size=IMG, patch_size=16, patch_stride=16, embed_dim=64, depth=2, num_heads=4)
    x = jnp.zeros((2, *IMG, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 64)
    assert m.grid_hw == (4, 2)
    # overlapping stride → more tokens
    m2 = ViTReID(img_size=IMG, patch_size=16, patch_stride=12, embed_dim=64, depth=1, num_heads=4)
    assert m2.grid_hw[0] > m.grid_hw[0]


def test_vit_sie_changes_output(rng):
    m = ViTReID(img_size=IMG, patch_size=16, patch_stride=16, embed_dim=64, depth=1,
                num_heads=4, sie_cameras=4)
    x = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, camera_ids=jnp.zeros(2, jnp.int32), train=False)
    out0 = m.apply(v, x, camera_ids=jnp.asarray([0, 0]), train=False)
    out1 = m.apply(v, x, camera_ids=jnp.asarray([1, 2]), train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def _rel_l2(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


@pytest.mark.parametrize("remat", ["full", "tuned"])
@pytest.mark.parametrize("name", ["vit_small", "transreid_jpm"])
def test_remat_numerically_equivalent(rng, name, remat):
    """remat re-executes the same math, but jax.checkpoint compiles each
    block as one closed call — XLA fusion boundaries move, so f32
    reductions reassociate. On LayerNorm *bias* gradients that rounding is
    amplified by catastrophic cancellation to O(1) rel-L2 — measured the
    SAME magnitude for plain jit-vs-eager on the unmodified model, so f32
    comparison cannot distinguish remat from an XLA version bump. The
    equivalence claim is checked where it is decidable: in f64 compute
    (dtype=jnp.float64 under a scoped enable_x64), every parameter
    gradient of a train-mode (droppath-active) forward agrees to
    rel-L2 < 1e-6 (measured ≤ 4e-9; a semantically different droppath
    mask or saved-tensor bug would be O(1))."""
    kw = dict(num_classes=5, id_loss_type="softmax") if name == "transreid_jpm" else {}
    with jax.enable_x64(True):
        x = jnp.asarray(rng.normal(size=(2, *IMG, 3)))
        base = get_model(name, jax.random.key(0), img_size=IMG,
                         dtype=jnp.float64, **kw)
        rem = get_model(name, jax.random.key(0), img_size=IMG,
                        dtype=jnp.float64, remat=remat, **kw)
        assert rem.module.remat == remat

        f0 = jax.tree.leaves(base.apply_eval(x))
        f1 = jax.tree.leaves(rem.apply_eval(x))
        for a, b in zip(f1, f0):
            assert _rel_l2(a, b) < 1e-6

        def loss(bundle, variables):
            rngs = {"droppath": jax.random.key(7)}
            out = bundle.module.apply(variables, x, train=True, rngs=rngs,
                                      mutable=["batch_stats"])[0]
            return sum(jnp.sum(t ** 2) for t in jax.tree.leaves(out))

        g0 = jax.grad(lambda v: loss(base, v))(base.variables)
        g1 = jax.grad(lambda v: loss(rem, v))(rem.variables)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            assert _rel_l2(a, b) < 1e-6


def test_remat_rejects_unknown_mode():
    from daliid_tpu.models.vit import remat_block_cls

    with pytest.raises(ValueError, match="remat"):
        remat_block_cls("everything")


@pytest.mark.parametrize("name", ["deit_small", "transreid_jpm"])
def test_gelu_approx_plumbed_through_factory(rng, name):
    """`gelu_approx=True` must actually reach the MLP blocks through the
    factory's **kw (a silently-swallowed flag here would mean the documented
    +9.7% serving option and the eval CLI's --gelu_approx do nothing)."""
    x = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    erf = get_model(name, jax.random.key(0), img_size=IMG)
    tanh = get_model(name, jax.random.key(0), img_size=IMG, gelu_approx=True)
    assert tanh.module.gelu_approx is True
    out_erf = np.asarray(erf.apply_eval(x))
    out_tanh = np.asarray(tanh.apply_eval(x))
    # same init, different GELU → close but not identical
    assert not np.array_equal(out_erf, out_tanh)
    assert np.max(np.abs(out_erf - out_tanh)) < 1.0


def test_transreid_jpm_shapes():
    from daliid_tpu.models.transreid_jpm import TransReIDJPM, shuffle_unit

    m = TransReIDJPM(
        img_size=(64, 32), patch_size=16, patch_stride=16, embed_dim=64, depth=3,
        num_heads=4, drop_path_rate=0.0, num_classes=7,
    )
    x = jnp.zeros((2, 64, 32, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 5 * 64)  # global + 4 locals

    # train mode: 5 logits + 5 features
    scores, feats = m.apply(v, x, train=True, mutable=["batch_stats"])[0]
    assert len(scores) == 5 and len(feats) == 5
    assert scores[0].shape == (2, 7)

    # shuffle_unit drops the cls token and permutes patches
    tokens = jnp.arange(2 * 9 * 4, dtype=jnp.float32).reshape(2, 9, 4)
    shuffled = shuffle_unit(tokens, shift=3, group=2)
    assert shuffled.shape == (2, 8, 4)
    # content preserved (a permutation of the 8 non-cls tokens)
    assert np.allclose(
        np.sort(np.asarray(shuffled[0, :, 0])), np.sort(np.asarray(tokens[0, 1:, 0]))
    )


def test_resize_pos_embed():
    pe = np.random.default_rng(0).normal(size=(1, 1 + 4 * 2, 8)).astype(np.float32)
    out = resize_pos_embed(pe, new_hw=(8, 4), old_hw=(4, 2))
    assert out.shape == (1, 1 + 32, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # cls token untouched


@pytest.mark.parametrize(
    "name,dim",
    [
        ("osnet", 512),
        ("densenet121", 2048),
        ("resnet50IBN", 2048),
        ("dualresnet50", 4096),
        ("efficientnetB0", 1280),
    ],
)
def test_backbone_zoo_shapes(name, dim):
    bundle = get_model(name, jax.random.key(0), img_size=IMG)
    out = bundle.apply_eval(jnp.zeros((2, *IMG, 3)))
    if isinstance(out, tuple):
        out = out[0]
    assert out.shape == (2, dim)
    assert bundle.feature_dim == dim


def test_inception_v3_shapes():
    # inception needs a bigger input (stem downsamples hard)
    bundle = get_model("inceptionV3", jax.random.key(0), img_size=(128, 128))
    out = bundle.apply_eval(jnp.zeros((2, 128, 128, 3)))
    assert out.shape == (2, 2048)


def test_resnet50_seg_attention_changes_output(rng):
    from daliid_tpu.models.resnet import ResNet50ReID

    m = ResNet50ReID(seg_attention=True)
    x = jnp.asarray(rng.normal(size=(1, *IMG, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    base = m.apply(v, x, train=False)
    mask = jnp.zeros((1, IMG[0] // 16, IMG[1] // 16, 1)).at[:, :2].set(1.0)
    masked = m.apply(v, x, seg_mask=mask, train=False)
    assert not np.allclose(np.asarray(base), np.asarray(masked))


def test_torch_port_roundtrip():
    # flax → torch-keys → flax must be the identity (validates key mapping
    # completeness and the OIHW↔HWIO transposes).
    bundle = get_model("resnet50", jax.random.key(0), img_size=IMG)
    torch_sd = resnet50_reid_to_torch_keys(bundle.variables)
    assert "layer4.0.downsample.0.weight" in torch_sd
    assert torch_sd["conv1.weight"].shape == (64, 3, 7, 7)
    back = resnet50_reid_from_torch(torch_sd)

    flat_a = jax.tree_util.tree_flatten_with_path(
        {"params": bundle.variables["params"], "batch_stats": bundle.variables["batch_stats"]}
    )[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    b_map = {jax.tree_util.keystr(k): v for k, v in flat_b}
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(b_map[jax.tree_util.keystr(k)]))


def test_strip_module_prefix():
    sd = {"module.conv1.weight": 1, "bn1.bias": 2}
    out = strip_module_prefix(sd)
    assert set(out) == {"conv1.weight", "bn1.bias"}


def test_torch_conv_bn_parity(rng):
    """Op-level parity: torch Conv2d+BatchNorm2d (eval) vs flax Conv+BatchNorm
    with ported weights — validates the layout/mapping conventions used by
    the full converter."""
    torch = pytest.importorskip("torch")
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(8)
    tbn.running_mean.data = torch.randn(8)
    tbn.running_var.data = torch.rand(8) + 0.5
    tbn.weight.data = torch.randn(8)
    tbn.bias.data = torch.randn(8)
    tconv.eval(), tbn.eval()

    x = rng.normal(size=(2, 3, 16, 12)).astype(np.float32)  # NCHW for torch
    with torch.no_grad():
        t_out = tbn(tconv(torch.from_numpy(x))).numpy()

    from flax import linen as nn

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2), padding=1, use_bias=False, name="conv")(x)
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)

    variables = {
        "params": {
            "conv": {"kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0)},
            "bn": {"scale": tbn.weight.detach().numpy(), "bias": tbn.bias.detach().numpy()},
        },
        "batch_stats": {
            "bn": {"mean": tbn.running_mean.numpy(), "var": tbn.running_var.numpy()},
        },
    }
    f_out = Mini().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out, atol=2e-5)
