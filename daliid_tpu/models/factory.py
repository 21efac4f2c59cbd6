"""Backbone factory — builds (online, momentum) model pairs.

Mirrors the reference factory ``getDCNN`` (``Person-ReID/Encoders.py:25-241``),
which builds two copies of the named backbone with synchronized weights
(online + EMA momentum model) and wraps each in ``nn.DataParallel``. Here a
"model" is a pure flax module plus a variables pytree; the momentum model is
simply a second copy of the variables (no module duplication), and data
parallelism is batch-axis sharding at call sites instead of module wrapping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from daliid_tpu.models.densenet import DenseNet121ReID
from daliid_tpu.models.efficientnet import EfficientNetB0ReID
from daliid_tpu.models.inception import InceptionV3ReID
from daliid_tpu.models.osnet import OSNetReID
from daliid_tpu.models.resnet import DualResNet50ReID, ResNet50ReID
from daliid_tpu.models.vit import (
    deit_small_reid,
    transreid_base,
    vit_base_reid,
    vit_small_reid,
)


@dataclasses.dataclass
class ModelBundle:
    """A backbone module + its variables ({'params', 'batch_stats'})."""

    module: Any
    variables: Dict[str, Any]
    feature_dim: int
    name: str

    def apply_eval(self, images, **kw):
        return self.module.apply(self.variables, images, train=False, **kw)


MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}

# Models whose factories actually consume these kwargs. Every factory takes
# ``**kw``, so an unsupported flag would be swallowed silently — the CLIs
# validate against these sets and fail loudly instead.
MARGIN_HEAD_MODELS = frozenset({"transreid_jpm"})
SIE_MODELS = frozenset({"transreid", "transreid_jpm"})
GELU_APPROX_MODELS = frozenset(
    {"vit", "vit_small", "deit_small", "transreid", "transreid_jpm"}
)
# Models whose factories plumb ``remat=`` into the transformer trunk
# (vit.REMAT_MODES — explicit activation-checkpoint policy for training).
# Independent of GELU_APPROX_MODELS: a factory must explicitly pass
# ``remat=`` through to earn a spot here, or the flag silently no-ops.
REMAT_MODELS = frozenset(
    {"vit", "vit_small", "deit_small", "transreid", "transreid_jpm"}
)


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


@register_model("resnet50")
def _resnet50(dtype=jnp.float32, feature="both", **kw):
    m = ResNet50ReID(dtype=dtype, feature=feature)
    return m, 2048


@register_model("resnet50_gap")
def _resnet50_gap(dtype=jnp.float32, **kw):
    return ResNet50ReID(dtype=dtype, feature="gap"), 2048


@register_model("resnet50Seg")
def _resnet50_seg(dtype=jnp.float32, **kw):
    """Seg-mask attention variant (Encoders.py:50-71, 356-401)."""
    return ResNet50ReID(dtype=dtype, seg_attention=True), 2048


@register_model("resnet50IBN")
def _resnet50_ibn(dtype=jnp.float32, **kw):
    """IBN-Net-a ResNet-50 (Encoders.py:73-97, 462-531)."""
    return ResNet50ReID(dtype=dtype, ibn=True), 2048


@register_model("resnet101IBN")
def _resnet101_ibn(dtype=jnp.float32, **kw):
    """IBN-Net-a ResNet-101 (Encoders.py:99-123, 534-603)."""
    return ResNet50ReID(dtype=dtype, ibn=True, stage_sizes=(3, 4, 23, 3)), 2048


@register_model("dualresnet50")
def _dual_resnet50(dtype=jnp.float32, **kw):
    """Two-head (id, bias) ResNet-50 (Encoders.py:404-459)."""
    return DualResNet50ReID(dtype=dtype), 4096


@register_model("osnet")
def _osnet(dtype=jnp.float32, feature="both", **kw):
    """OSNet-x1.0 (Encoders.py:125-146, 642-684)."""
    return OSNetReID(dtype=dtype, feature=feature), 512


@register_model("densenet121")
def _densenet121(dtype=jnp.float32, num_classes=0, **kw):
    """DenseNet-121 (Encoders.py:148-169, 606-639)."""
    return DenseNet121ReID(dtype=dtype, num_classes=num_classes), 2048


@register_model("efficientnetB0")
def _efficientnet_b0(dtype=jnp.float32, feature="both", **kw):
    """EfficientNet-B0 (Encoders.py:218-239, 831-864)."""
    return EfficientNetB0ReID(dtype=dtype, feature=feature), 1280


@register_model("inceptionV3")
def _inception_v3(dtype=jnp.float32, feature="both", **kw):
    """Inception-V3 (Encoders.py:171-192, 686-763)."""
    return InceptionV3ReID(dtype=dtype, feature=feature), 2048


@register_model("vit")
def _vit(dtype=jnp.float32, img_size=(256, 128), gelu_approx=False,
         use_pallas_attention=False, remat="none", **kw):
    m = vit_base_reid(dtype=dtype, img_size=tuple(img_size), gelu_approx=gelu_approx,
                      use_pallas_attention=use_pallas_attention, remat=remat)
    return m, 768


@register_model("vit_small")
def _vit_small(dtype=jnp.float32, img_size=(256, 128), gelu_approx=False,
               use_pallas_attention=False, remat="none", **kw):
    """Reference-exact vit_small (vit_pytorch.py:461-468): 768/8/8, mlp 3,
    no qkv bias, qk_scale 768^-0.5."""
    m = vit_small_reid(dtype=dtype, img_size=tuple(img_size), gelu_approx=gelu_approx,
                       use_pallas_attention=use_pallas_attention, remat=remat)
    return m, 768


@register_model("deit_small")
def _deit_small(dtype=jnp.float32, img_size=(256, 128), gelu_approx=False,
                use_pallas_attention=False, remat="none", **kw):
    """DeiT-small shape (vit_pytorch.py:470-476)."""
    m = deit_small_reid(dtype=dtype, img_size=tuple(img_size), gelu_approx=gelu_approx,
                        use_pallas_attention=use_pallas_attention, remat=remat)
    return m, 384


@register_model("tiny_vit_smoke")
def _tiny_vit_smoke(dtype=jnp.float32, img_size=(32, 16), **kw):
    """One-block 32-d ViT for pipeline smoke runs and failure drills
    (cli/supervise.py recovery tests, CI) — not a reference model; builds in
    milliseconds so subprocess-spawning drills stay cheap."""
    from daliid_tpu.models.vit import ViTReID

    m = ViTReID(img_size=tuple(img_size), patch_size=8, patch_stride=8,
                embed_dim=32, depth=1, num_heads=2, drop_path_rate=0.0,
                dtype=dtype)
    return m, 32


@register_model("transreid_jpm")
def _transreid_jpm(dtype=jnp.float32, img_size=(256, 128), sie_cameras=0, sie_views=0,
                   sie_coef=1.5, num_classes=0, id_loss_type="softmax", margin_s=None,
                   margin_m=None, gelu_approx=False, use_pallas_attention=False,
                   remat="none", **kw):
    """TransReID with the jigsaw patch module (make_models.py:221-389)."""
    from daliid_tpu.models.transreid_jpm import TransReIDJPM

    m = TransReIDJPM(
        img_size=tuple(img_size), sie_cameras=sie_cameras, sie_views=sie_views,
        sie_coef=sie_coef, num_classes=num_classes, id_loss_type=id_loss_type,
        margin_s=margin_s, margin_m=margin_m, gelu_approx=gelu_approx,
        use_pallas_attention=use_pallas_attention, remat=remat, dtype=dtype,
    )
    return m, 5 * 768


@register_model("transreid")
def _transreid(dtype=jnp.float32, img_size=(256, 128), sie_cameras=0, sie_views=0,
               sie_coef=1.5, gelu_approx=False, use_pallas_attention=False,
               remat="none", **kw):
    m = transreid_base(
        img_size=tuple(img_size), sie_cameras=sie_cameras, sie_views=sie_views,
        sie_coef=sie_coef, gelu_approx=gelu_approx,
        use_pallas_attention=use_pallas_attention, remat=remat, dtype=dtype,
    )
    return m, 768


def get_model(name: str, rng: jax.Array, img_size=(256, 128), dtype=jnp.float32, **kw) -> ModelBundle:
    """Build + initialize one backbone. Analogous to one arm of ``getDCNN``
    (``Encoders.py:25-241``); unknown names raise like the reference's
    fallthrough."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODEL_REGISTRY)}")
    module, feature_dim = MODEL_REGISTRY[name](dtype=dtype, img_size=img_size, **kw)
    dummy = jnp.zeros((1, img_size[0], img_size[1], 3), dtype=jnp.float32)
    # Initialize on host CPU: init is a one-shot shape-driven program and
    # compiling it for the accelerator is pure startup latency (minutes over
    # a remote-compile link). The trainer device_puts the variables where
    # they belong.
    # NOTE: eager, not jit — jit would target the accelerator backend
    # regardless of default_device and pay a full remote compile.
    # local_devices, not devices: on a multi-process mesh jax.devices()[0]
    # can be ANOTHER process's CPU — committing the init arrays there makes
    # them non-addressable and the momentum jnp.copy fails (multihost drill)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = module.init({"params": jax.device_put(rng, cpu)}, dummy, train=False)
    return ModelBundle(module=module, variables=variables, feature_dim=feature_dim, name=name)


@register_model("multipart_resnet50")
def _multipart_resnet50(dtype=jnp.float32, **kw):
    """Horizontal-stripe part heads (getFeatures.py:110-156 consumer;
    mainKIT.py:211-313 variant)."""
    from daliid_tpu.models.resnet import MultiPartResNet50ReID

    return MultiPartResNet50ReID(dtype=dtype), 2048


@register_model("multiview_resnet50")
def _multiview_resnet50(dtype=jnp.float32, **kw):
    """Global/spatial/channel attention heads (getFeatures.py:202-241
    consumer; Encoders.py:517-531 attention design)."""
    from daliid_tpu.models.resnet import MultiViewResNet50ReID

    return MultiViewResNet50ReID(dtype=dtype), 2048


def build_ensembles(
    rng: jax.Array,
    names=("resnet50", "osnet", "densenet121"),
    img_size=(256, 128),
    dtype=jnp.float32,
):
    """Three-backbone ensemble: a synced (online, momentum) pair per backbone
    — ``getEnsembles`` (``Encoders.py:245-301``, which builds resnet50 +
    osnet + densenet121 pairs)."""
    pairs = []
    for i, name in enumerate(names):
        pairs.append(build_model_pair(name, jax.random.fold_in(rng, i), img_size=img_size, dtype=dtype))
    return pairs


def build_model_pair(name: str, rng: jax.Array, img_size=(256, 128), dtype=jnp.float32, **kw):
    """(online, momentum) pair with identical initial weights — the weight
    sync at ``Encoders.py:36-44`` (momentum copies online's state_dict)."""
    online = get_model(name, rng, img_size=img_size, dtype=dtype, **kw)
    momentum = ModelBundle(
        module=online.module,
        variables=jax.tree.map(jnp.copy, online.variables),
        feature_dim=online.feature_dim,
        name=name,
    )
    return online, momentum
