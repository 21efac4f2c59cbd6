"""OSNet ReID backbone in flax — omni-scale residual blocks, 512-d head.

TPU re-implementation of the OSNet architecture (Zhou et al., "Omni-Scale
Feature Learning for Person Re-Identification") that the reference consumes
via torchreid (``osnet_x1_0``, ``Person-ReID/Encoders.py:125-146``) and
wraps with a GAP+GMP sum + 512-d BN neck (``OSNETReID``,
``Encoders.py:642-684``). The wrapper's forward (conv1 → maxpool → conv2-5 →
avg+max pool → BN) is reproduced; the fc layer the wrapper bypasses
(``Encoders.py:655,676``) is likewise omitted.

Structure: stem 7x7/2 + maxpool; three omni-scale stages (2 blocks each,
channels 256/384/512) with 1x1+avgpool transitions; a final 1x1 conv. Each
OSBlock runs 4 parallel streams of 1..4 stacked depthwise-separable "lite"
3x3 convs, merged by a shared channel aggregation gate.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm


def _bn(train, dtype, name):
    return TorchBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=self.kernel // 2, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.relu(x)


class LiteConv3x3(nn.Module):
    """1x1 pointwise + 3x3 depthwise + BN + ReLU (OSNet's Lite conv)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(x)
        x = nn.Conv(
            self.features, (3, 3), padding=1, feature_group_count=self.features,
            use_bias=False, dtype=self.dtype, name="dw",
        )(x)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Aggregation gate: GAP → fc reduce → ReLU → fc expand → sigmoid."""

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(max(self.channels // self.reduction, 4), dtype=self.dtype, name="fc1")(g)
        g = nn.relu(g)
        g = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class OSBlock(nn.Module):
    """Omni-scale residual block: 4 streams of depth 1..4 lite convs,
    unified by a single shared channel gate, 1x1 expand, residual add."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_channels // 4
        identity = x
        y = ConvBNReLU(mid, 1, dtype=self.dtype, name="reduce")(x, train)

        gate = ChannelGate(mid, dtype=self.dtype, name="gate")
        merged = None
        for depth in range(1, 5):
            s = y
            for d in range(depth):
                s = LiteConv3x3(mid, dtype=self.dtype, name=f"stream{depth}_{d}")(s, train)
            s = gate(s)
            merged = s if merged is None else merged + s

        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(merged)
        out = _bn(train, self.dtype, "expand_bn")(out)
        if identity.shape[-1] != self.out_channels:
            identity = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="shortcut"
            )(identity)
            identity = _bn(train, self.dtype, "shortcut_bn")(identity)
        return nn.relu(out + identity)


class OSNetReID(nn.Module):
    """OSNet-x1.0 trunk + the reference's ReID head → (B, 512)."""

    feature: str = "both"
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBNReLU(64, 7, 2, dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, ch in enumerate((256, 384, 512), start=2):
            for b in range(2):
                x = OSBlock(ch, dtype=self.dtype, name=f"conv{stage}_{b}")(x, train)
            if stage < 4:  # transition: 1x1 conv + 2x2 avg pool /2
                x = ConvBNReLU(ch, 1, dtype=self.dtype, name=f"transition{stage}")(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = ConvBNReLU(512, 1, dtype=self.dtype, name="conv5")(x, train)

        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        pooled = {"gap": gap, "gmp": gmp}.get(self.feature, gap + gmp).astype(jnp.float32)
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)
