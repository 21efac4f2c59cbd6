"""ResNet-50 ReID backbone in flax — NHWC, last-stride-1, GAP+GMP, BN-neck.

TPU-native re-design of the reference wrapper ``ResNet50ReID``
(``Person-ReID/Encoders.py:306-351``) over torchvision's ResNet-50 (v1.5
bottleneck: stride on the 3x3 conv):

- last-stride-1: the first block of stage 4 and its projection shortcut use
  stride 1 (``Encoders.py:321-322``), doubling final spatial resolution;
- head: global-average-pool + global-max-pool, summed (``Encoders.py:341-345``),
  then a 1-D BatchNorm neck (``Encoders.py:327,350``) → 2048-d embedding;
- the reference deliberately **skips the stem ReLU** ("Do not discomment!",
  ``Encoders.py:334``) — reproduced here for checkpoint parity;
- switchable ``gap | gmp | both`` pooling for magnitude-weighted fusion
  (``evaluateCleanATModels.py:296-388``).

Layout is NHWC with fp32 params and a configurable compute dtype (bf16 on
TPU so convs hit the MXU at full rate); XLA fuses the normalize/activation
chains.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm


class IBN(nn.Module):
    """Instance-Batch Norm: InstanceNorm on the first half of the channels,
    BatchNorm on the second half (IBN-Net; used by the reference's
    ``resnet50IBN``/``resnet101IBN`` torch.hub backbones,
    ``Encoders.py:73-123``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = x.shape[-1] // 2
        a = nn.InstanceNorm(epsilon=1e-5, dtype=self.dtype, name="instance")(x[..., :half])
        b = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="batch"
        )(x[..., half:])
        return jnp.concatenate([a, b], axis=-1)


class Bottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: 1x1 → 3x3(stride) → 1x1 with projection
    shortcut on shape change. ``ibn=True`` swaps bn1 for an IBN block
    (IBN-Net 'a' variant)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    ibn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        if self.ibn:
            y = IBN(dtype=self.dtype, name="bn1_ibn")(y, train=train)
        else:
            y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


def _resnet_trunk(mod, x, train: bool):
    """Shared ResNet trunk (stem without ReLU + 4 bottleneck stages).

    A plain function executed inside the caller's compact scope — submodules
    bind to the calling module, so ResNet50ReID and DualResNet50ReID share
    one trunk definition (and one checkpoint key scheme).
    """
    x = x.astype(mod.dtype)
    x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=mod.dtype, name="conv1")(x)
    x = TorchBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=mod.dtype, name="bn1"
    )(x)
    # NOTE: no stem ReLU — matches the reference forward (Encoders.py:332-335).
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    planes = (64, 128, 256, 512)
    strides = (1, 2, 2, mod.last_stride)
    ibn = getattr(mod, "ibn", False)
    for stage, (num_blocks, p, s) in enumerate(zip(mod.stage_sizes, planes, strides), start=1):
        for block in range(num_blocks):
            x = Bottleneck(
                planes=p,
                stride=s if block == 0 else 1,
                ibn=ibn and stage < 4,  # IBN-Net 'a': no IBN in the last stage
                dtype=mod.dtype,
                name=f"layer{stage}_{block}",
            )(x, train=train)
    return x


class ResNet50ReID(nn.Module):
    """ResNet trunk + ReID head. ``__call__`` → (B, 2048) embedding.

    ``ibn=True`` gives the IBN-Net 'a' trunk (IBN in stages 1-3) matching
    the reference's ``ResNet50IBNReID``/``ResNet101IBNReID`` wrappers
    (``Encoders.py:462-603``, identical forward to the plain wrapper).
    ``seg_attention`` enables the optional segmentation-mask multiply before
    pooling (``ResNet50SegReID``, ``Encoders.py:379-401``).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    feature: str = "both"  # 'gap' | 'gmp' | 'both' (evaluateCleanATModels.py:296-388)
    last_stride: int = 1   # Encoders.py:321-322
    ibn: bool = False
    seg_attention: bool = False
    return_feature_map: bool = False  # (feature_map, embedding) mode for
                                      # extractFeatureMaps (getFeatures.py:74-108)
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, seg_mask=None, train: bool = False):
        x = _resnet_trunk(self, x, train)
        feature_map = x
        if self.seg_attention and seg_mask is not None:
            x = x * seg_mask.astype(x.dtype)  # Encoders.py:391-392

        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        if self.feature == "gap":
            pooled = gap
        elif self.feature == "gmp":
            pooled = gmp
        else:
            pooled = gap + gmp  # Encoders.py:341-345

        pooled = pooled.astype(jnp.float32)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)
        if self.return_feature_map:
            return feature_map.astype(jnp.float32), out
        return out


class MultiPartResNet50ReID(nn.Module):
    """ResNet-50 with horizontal-stripe part heads: the trunk feature map is
    split into upper/middle/lower bands, each pooled (GAP+GMP) through its
    own BN neck, plus the global head — the multipart forward consumed by
    ``extractFeaturesMultiPart`` (``Person-ReID/getFeatures.py:110-156``;
    model variant at ``mainKIT.py:211-313``).

    Returns (upper, middle, lower, global), each (B, 2048).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _resnet_trunk(self, x, train)
        h = feats.shape[1]
        if h >= 3:
            bands = [feats[:, : h // 3], feats[:, h // 3 : 2 * h // 3], feats[:, 2 * h // 3 :], feats]
        else:
            # degenerate feature maps (tiny inputs): parts see the full map
            bands = [feats, feats, feats, feats]

        def head(f, name):
            pooled = (jnp.mean(f, axis=(1, 2)) + jnp.max(f, axis=(1, 2))).astype(jnp.float32)
            return TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(pooled)

        names = ("upper_bn", "middle_bn", "lower_bn", "last_bn")
        return tuple(head(f, n) for f, n in zip(bands, names))


class MultiViewResNet50ReID(nn.Module):
    """ResNet-50 with global / spatial-attention / channel-attention heads.

    Provides the three-view forward consumed by ``extractFeaturesMultiView``
    (``Person-ReID/getFeatures.py:202-241``), built from the reference's
    (unused) ``spatial_channel_attention`` design
    (``Encoders.py:517-531``): a 1x1-conv sigmoid spatial gate and a
    squeeze/expand sigmoid channel gate over the trunk feature map.

    Returns (global_fv, spatial_fv, channel_fv), each (B, 2048).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _resnet_trunk(self, x, train)
        ch = feats.shape[-1]

        # spatial gate: 1x1 conv → sigmoid (Encoders.py:520)
        space_att = nn.sigmoid(
            nn.Conv(1, (1, 1), dtype=self.dtype, name="spatial_gate")(feats)
        )
        # channel gate: concat(gap, gmp) → squeeze 1x1 → relu → expand 1x1 →
        # sigmoid (Encoders.py:522-527)
        gp = jnp.concatenate(
            [jnp.mean(feats, axis=(1, 2)), jnp.max(feats, axis=(1, 2))], axis=-1
        )[:, None, None, :]
        squeezed = nn.relu(nn.Conv(ch // 2, (1, 1), dtype=self.dtype, name="channel_squeeze")(gp))
        channel_att = nn.sigmoid(nn.Conv(ch, (1, 1), dtype=self.dtype, name="channel_expand")(squeezed))

        def head(f, name):
            pooled = (jnp.mean(f, axis=(1, 2)) + jnp.max(f, axis=(1, 2))).astype(jnp.float32)
            return TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(pooled)

        return (
            head(feats, "last_bn"),
            head(feats * space_att, "spatial_bn"),
            head(feats * channel_att, "channel_bn"),
        )


class DualResNet50ReID(nn.Module):
    """Two-head ResNet-50: a shared trunk with separate identity / bias
    BN-neck heads, returning (concat, id_fv, bias_fv) — the intended
    behavior of the reference's ``DualResNet50ReID``
    (``Encoders.py:404-459``; its ``super`` call is buggy upstream)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _resnet_trunk(self, x, train)
        pooled = (jnp.mean(feats, axis=(1, 2)) + jnp.max(feats, axis=(1, 2))).astype(jnp.float32)
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=name
        )
        id_fv = bn("id_bn")(pooled)
        bias_fv = bn("bias_bn")(pooled)
        return jnp.concatenate([id_fv, bias_fv], axis=1), id_fv, bias_fv
