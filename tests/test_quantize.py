"""Int8 PTQ path (ops/quantize.py): exact integer semantics, zoo coverage,
extractor wiring, and fp-parity bands.

Beyond-reference surface: the reference serves fp32 CUDA inference
(``Person-ReID/getFeatures.py``) with no quantization story; on TPU v5e the
int8 MXU mode doubles matmul rate (tools/bench_int8_mxu.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.ops.quantize import (
    calibrate,
    make_quantized_interceptor,
    quantized_apply,
)

IMG = (32, 16)


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    a, b = a.reshape(len(a), -1), b.reshape(len(b), -1)
    num = (a * b).sum(1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    return num / den


class OneConv(nn.Module):
    features: int = 8
    kernel: tuple = (1, 1)
    padding: object = "SAME"
    strides: tuple = (1, 1)
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            feature_group_count=self.groups, use_bias=self.use_bias, name="conv",
        )(x)


def test_int8_semantics_exact_vs_numpy():
    """The quantized 1x1 conv must equal the literal integer computation:
    symmetric per-tensor input / per-channel weight quantization, int32
    accumulation, f32 dequant."""
    rng = np.random.default_rng(0)
    m = OneConv(features=6)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 5)), jnp.float32)
    v = m.init(jax.random.key(1), x)

    scales = calibrate(m, v, x)
    assert list(scales) == ["conv"]
    out = np.asarray(quantized_apply(m, v, scales, x))

    w = np.asarray(v["params"]["conv"]["kernel"], np.float64)  # (1,1,5,6)
    s_in = scales["conv"] / 127.0
    xq = np.clip(np.round(np.asarray(x, np.float64) / s_in), -127, 127).astype(np.int32)
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0  # per-channel (6,)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    acc = np.einsum("bhwi,io->bhwo", xq, wq[0, 0])  # int32 exact
    expected = acc.astype(np.float64) * (s_in * s_w)
    np.testing.assert_allclose(out, expected.astype(np.float32), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(kernel=(3, 3), padding=1),
        dict(kernel=(3, 3), padding="SAME", strides=(2, 2)),
        dict(kernel=(3, 3), padding="VALID"),
        dict(kernel=(3, 3), padding=1, groups=5, features=5),  # depthwise
        dict(kernel=(1, 1), use_bias=True),
        dict(kernel=(7, 7), padding=3, strides=(2, 2)),  # resnet stem shape
    ],
)
def test_conv_config_coverage(cfg):
    """Every conv configuration the zoo uses: the quantized op keeps the fp
    output shape and stays within PTQ noise of the fp result."""
    rng = np.random.default_rng(3)
    m = OneConv(**{**dict(features=5), **cfg})
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x))
    scales = calibrate(m, v, x)
    out = np.asarray(quantized_apply(m, v, scales, x))
    assert out.shape == ref.shape
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.03, cfg


def test_unsupported_dilation_raises():
    class Dilated(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), kernel_dilation=(2, 2), name="conv")(x)

    m = Dilated()
    x = jnp.ones((1, 8, 8, 3))
    v = m.init(jax.random.key(0), x)
    scales = calibrate(m, v, x)
    with pytest.raises(NotImplementedError, match="kernel_dilation"):
        quantized_apply(m, v, scales, x)


def test_skip_and_missing_scales_fall_through():
    rng = np.random.default_rng(1)
    m = OneConv(features=4, kernel=(3, 3), padding=1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x))
    scales = calibrate(m, v, x)
    # skip predicate keeps the conv in fp — output must be bit-identical
    with nn.intercept_methods(make_quantized_interceptor(scales, skip=lambda p: True)):
        out = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(out, ref)
    # a conv missing from the scales dict also falls through
    out2 = np.asarray(quantized_apply(m, v, {}, x))
    np.testing.assert_array_equal(out2, ref)


@pytest.mark.parametrize("model_key", ["resnet", "osnet", "densenet", "efficientnet"])
def test_zoo_coverage(model_key):
    """Interception covers every CNN family without model changes: all convs
    get calibrated and the int8 features stay directionally faithful."""
    from daliid_tpu.models.densenet import DenseNet121ReID
    from daliid_tpu.models.efficientnet import EfficientNetB0ReID
    from daliid_tpu.models.osnet import OSNetReID
    from daliid_tpu.models.resnet import ResNet50ReID

    builders = {
        "resnet": lambda: ResNet50ReID(stage_sizes=(1, 1, 1, 1)),
        "osnet": lambda: OSNetReID(),
        "densenet": lambda: DenseNet121ReID(block_sizes=(2, 2, 2, 2), growth=8),
        "efficientnet": lambda: EfficientNetB0ReID(),
    }
    m = builders[model_key]()
    rng = np.random.default_rng(7)
    # densenet's 5 downsamplings need a taller test image (a 32x16 input
    # reaches a zero-width feature map in the last transition)
    shape = (2, 64, 32, 3) if model_key == "densenet" else (2, *IMG, 3)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    # adapt the BN running stats to this input: untrained running stats let
    # activations decay exponentially with depth (efficientnet reaches 1e-8
    # by the head on random weights), which is not a regime any trained
    # checkpoint produces and drowns the signal in compounding PTQ noise
    for _ in range(8):
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}

    scales = calibrate(m, v, x, train=False)
    assert len(scales) >= 5, scales  # every conv sown, none silently missed
    ref = np.asarray(m.apply(v, x, train=False))
    out = np.asarray(quantized_apply(m, v, scales, x, train=False))
    cos = _cos(out, ref)
    assert cos.min() > 0.99, (model_key, cos.min())


def test_feature_extractor_int8(tmp_path):
    """The user-facing wiring: quantize='int8' lazily calibrates on the
    first batch, extracts features close to the fp extractor, and drops the
    stale scales when new weights arrive."""
    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.models.factory import ModelBundle
    from daliid_tpu.models.resnet import ResNet50ReID

    splits, _ = make_synthetic_dataset(
        str(tmp_path / "data"), num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1], with_turbulence=False,
    )
    m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    bundle = ModelBundle(module=m, variables=v, feature_dim=2048, name="tiny")

    fp = FeatureExtractor(bundle, img_size=IMG, batch_size=8)
    q = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8")
    table = splits["gallery"]
    f_fp = fp.extract(table)
    f_q = q.extract(table)
    assert q.quant_scales is not None and len(q.quant_scales) >= 17
    assert f_q.shape == f_fp.shape
    assert _cos(f_q, f_fp).min() > 0.995

    # retrieval parity: int8 features must rank the gallery like fp ones
    from daliid_tpu.eval.validate import Validator

    val = Validator(img_size=IMG, batch_size=8, max_rank=5)
    queries = splits["query"]
    qf_fp, qf_q = fp.extract(queries), q.extract(queries)
    cmc_fp, map_fp = val.rank(val.distance_matrix(qf_fp, f_fp), queries, table)
    cmc_q, map_q = val.rank(val.distance_matrix(qf_q, f_q), queries, table)
    assert abs(float(map_q) - float(map_fp)) < 0.02, (map_fp, map_q)
    assert abs(float(cmc_q[0]) - float(cmc_fp[0])) < 0.05, (cmc_fp[0], cmc_q[0])

    # new weights invalidate the calibration
    q.update_variables({"params": v["params"], "batch_stats": v["batch_stats"]})
    assert q.quant_scales is None

    # an empty extract must NOT latch calibration from the all-zero padded
    # batch — the next real extract calibrates on real data
    empty = q.extract([])
    assert empty.shape[0] == 0 and q.quant_scales is None
    f_q2 = q.extract(table)
    assert q.quant_scales is not None
    assert _cos(f_q2, f_fp).min() > 0.995

    # a short first batch must calibrate on the real rows TILED to the
    # batch, not on zero padding (u8=0 rows normalize to the most extreme
    # constant image and would skew the absmax stats): scales from a
    # 1-image extract equal scales from that image explicitly tiled
    q_short = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8")
    one = q_short.extract(table.paths[:1])
    assert one.shape[0] == 1 and q_short.quant_scales is not None
    q_ref = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8")
    img = q_ref._decode_paths([str(table.paths[0])])
    q_ref.calibrate(np.tile(img, (8, 1, 1, 1)))
    assert q_short.quant_scales == q_ref.quant_scales


def test_feature_extractor_calib_batches(tmp_path):
    """Multi-batch calibration (--calib_batches, VERDICT r3 item 5): a
    skewed first batch — near-constant mid-gray images whose normalized
    absmax is ~13x below real data — bakes clipping scales into
    single-batch mode, while calib_batches=2 folds the first REAL batch
    into the running absmax and holds the fp-parity band."""
    from PIL import Image

    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.models.factory import ModelBundle
    from daliid_tpu.models.resnet import ResNet50ReID

    splits, _ = make_synthetic_dataset(
        str(tmp_path / "data"), num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1], with_turbulence=False,
    )
    table = splits["gallery"]
    rng = np.random.default_rng(3)
    gray_dir = tmp_path / "gray"
    gray_dir.mkdir()
    gray_paths = []
    for i in range(8):  # one full batch of low-dynamic-range images
        arr = (128 + rng.integers(-2, 3, size=(*IMG, 3))).astype(np.uint8)
        p = str(gray_dir / f"g{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        gray_paths.append(p)
    paths = gray_paths + [str(p) for p in table.paths]
    n_real = len(table.paths)

    m = ResNet50ReID(stage_sizes=(1, 1, 1, 1))
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((1, *IMG, 3)), train=False)
    bundle = ModelBundle(module=m, variables=v, feature_dim=2048, name="tiny")

    fp = FeatureExtractor(bundle, img_size=IMG, batch_size=8)
    f_fp = fp.extract(paths)[-n_real:]

    one = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8")
    f_one = one.extract(paths)[-n_real:]
    two = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8",
                           calib_batches=2)
    f_two = two.extract(paths)[-n_real:]

    # the running max dominates every single-batch scale...
    assert set(two.quant_scales) == set(one.quant_scales)
    assert all(two.quant_scales[k] >= one.quant_scales[k] - 1e-6
               for k in one.quant_scales)
    # ...and the input-range skew is material: at least one conv's scale
    # (the stem, which sees the raw normalized image) grows severalfold
    growth = max(
        two.quant_scales[k] / max(one.quant_scales[k], 1e-12)
        for k in one.quant_scales
    )
    assert growth > 3, growth

    cos_one = _cos(f_one, f_fp).min()
    cos_two = _cos(f_two, f_fp).min()
    assert cos_two > 0.995, cos_two
    assert cos_two > cos_one, (cos_one, cos_two)
    # the skew must actually have bitten single-batch mode, or this test
    # guards nothing
    assert cos_one < 0.99, cos_one

    # fewer real batches than calib_batches: finalize at stream end
    few = FeatureExtractor(bundle, img_size=IMG, batch_size=8, quantize="int8",
                           calib_batches=5)
    f_few = few.extract([str(p) for p in table.paths])
    assert few.quant_scales is not None and few._calib_final
    assert _cos(f_few, fp.extract([str(p) for p in table.paths])).min() > 0.995

    with pytest.raises(ValueError, match="calib_batches"):
        FeatureExtractor(bundle, img_size=IMG, quantize="int8", calib_batches=0)


class OneDense(nn.Module):
    features: int = 256
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(self.features, use_bias=self.use_bias, name="fc")(x)


def test_int8_dtype_none_promotes_like_flax():
    """Modules built with dtype=None must return flax's promoted dtype
    (f32 params + bf16 input → f32), not the input's bf16 — otherwise the
    quantized path silently drops precision the fp path kept (review fix)."""
    rng = np.random.default_rng(3)
    md = OneDense(features=192)
    x32 = jnp.asarray(rng.standard_normal((4, 160)), jnp.float32)
    vd = md.init(jax.random.key(0), x32)  # f32 params, dtype=None module
    xb = x32.astype(jnp.bfloat16)
    assert md.apply(vd, xb).dtype == jnp.float32  # flax promote rule
    assert quantized_apply(md, vd, {}, xb).dtype == jnp.float32

    mc = OneConv(features=8)
    xc = jnp.asarray(rng.standard_normal((1, 4, 4, 16)), jnp.float32)
    vc = mc.init(jax.random.key(1), xc)
    scales = calibrate(mc, vc, xc)
    xcb = xc.astype(jnp.bfloat16)
    assert mc.apply(vc, xcb).dtype == jnp.float32
    assert quantized_apply(mc, vc, scales, xcb).dtype == jnp.float32


@pytest.mark.parametrize("mode", ["dynamic", "static"])
def test_dense_int8_semantics_exact_vs_numpy(mode):
    """The quantized Dense must equal the literal integer computation:
    per-row dynamic (no calibration entry) or per-tensor static (calibrated)
    activation scales, per-column weight scales, int32 accumulation, f32
    dequant + bias."""
    rng = np.random.default_rng(5)
    m = OneDense(features=192)
    x = jnp.asarray(rng.standard_normal((3, 7, 160)), jnp.float32)
    v = m.init(jax.random.key(2), x)
    scales = {} if mode == "dynamic" else calibrate(m, v, x)
    if mode == "static":
        assert list(scales) == ["fc"]
    out = np.asarray(quantized_apply(m, v, scales, x))

    w = np.asarray(v["params"]["fc"]["kernel"], np.float64)  # (160, 192)
    b = np.asarray(v["params"]["fc"]["bias"], np.float64)
    xf = np.asarray(x, np.float64)
    if mode == "dynamic":
        s_in = np.maximum(np.abs(xf).max(-1, keepdims=True) / 127.0, 1e-12)
    else:
        s_in = scales["fc"] / 127.0
    xq = np.clip(np.round(xf / s_in), -127, 127).astype(np.int32)
    s_w = np.maximum(np.abs(w).max(0, keepdims=True) / 127.0, 1e-12)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    acc = np.einsum("bni,io->bno", xq, wq)  # int32 exact
    expected = acc.astype(np.float64) * s_in * s_w + b
    np.testing.assert_allclose(out, expected.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_dense_below_mxu_tile_falls_through():
    """SE-gate-sized matmuls stay in fp (quantize glue would dominate), and
    dense=False disables the Dense path entirely."""
    rng = np.random.default_rng(6)
    small = OneDense(features=32)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    v = small.init(jax.random.key(0), x)
    ref = np.asarray(small.apply(v, x))
    np.testing.assert_array_equal(np.asarray(quantized_apply(small, v, {}, x)), ref)

    big = OneDense(features=256)
    vb = big.init(jax.random.key(0), x)
    refb = np.asarray(big.apply(vb, x))
    np.testing.assert_array_equal(
        np.asarray(quantized_apply(big, vb, {}, x, dense=False)), refb
    )
    # and with dense on, the big matmul IS quantized (differs from fp)
    assert np.abs(np.asarray(quantized_apply(big, vb, {}, x)) - refb).max() > 0


def test_vit_int8_parity():
    """ViT family coverage: qkv/proj/fc1/fc2 run int8 (dynamic per-token
    scales) plus the calibrated patch-embed conv; features stay
    directionally faithful to the fp forward."""
    from daliid_tpu.models.vit import ViTReID

    m = ViTReID(img_size=(32, 16), patch_size=8, patch_stride=8,
                embed_dim=192, depth=2, num_heads=3, drop_path_rate=0.0)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 3)), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    for _ in range(4):
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"droppath": jax.random.key(1)})
        v = {"params": v["params"], "batch_stats": upd["batch_stats"]}

    scales = calibrate(m, v, x, train=False)
    # the patch-embed conv plus every block's qkv/proj/fc1/fc2
    assert "patch_embed" in scales
    assert "block0/attn/qkv" in scales and "block1/mlp/fc2" in scales
    assert len(scales) == 1 + 2 * 4
    ref = np.asarray(m.apply(v, x, train=False))
    out = np.asarray(quantized_apply(m, v, scales, x, train=False))
    assert out.shape == ref.shape
    assert _cos(out, ref).min() > 0.99
    # dynamic fallback (no Dense calibration entries) also stays faithful
    out_dyn = np.asarray(
        quantized_apply(m, v, {"patch_embed": scales["patch_embed"]}, x, train=False)
    )
    assert _cos(out_dyn, ref).min() > 0.99


def test_feature_extractor_int8_vit_sharded(tmp_path):
    """ViT-family int8 through the user-facing extractor on the 8-device
    mesh: conv + Dense interception must compile and execute batch-sharded
    (the production multi-chip serving path), with features close to fp."""
    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.models import get_model

    splits, _ = make_synthetic_dataset(
        str(tmp_path / "data"), num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
        height=IMG[0], width=IMG[1], with_turbulence=False,
    )
    vit = get_model("deit_small", jax.random.key(1), img_size=IMG, dtype=jnp.float32)
    fp = FeatureExtractor(vit, img_size=IMG, batch_size=8)
    q = FeatureExtractor(vit, img_size=IMG, batch_size=8, quantize="int8")
    assert fp.mesh.devices.size > 1  # conftest's virtual 8-device mesh
    f_fp = fp.extract(splits["gallery"])
    f_q = q.extract(splits["gallery"])
    # calibration found the patch-embed conv AND the block Dense layers
    assert any("qkv" in k for k in q.quant_scales)
    assert any("patch_embed" in k for k in q.quant_scales)
    assert _cos(f_q, f_fp).min() > 0.98


def test_feature_extractor_rejects_unknown_mode():
    from daliid_tpu.eval.features import FeatureExtractor

    with pytest.raises(ValueError, match="int8"):
        FeatureExtractor(object(), quantize="fp4")
