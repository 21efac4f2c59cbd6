"""EfficientNet-B0 ReID backbone in flax.

TPU re-implementation of the torchvision EfficientNet-B0 trunk the
reference wraps (``efficientnetB0ReID``, ``Person-ReID/Encoders.py:831-864``,
built at ``Encoders.py:218-239``): MBConv stages → 1x1 conv to 1280 →
GAP+GMP sum → 1280-d BN neck. SiLU activations, squeeze-excitation in every
MBConv, expansion/stride/repeat schedule per the published B0 config.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm


def _bn(train, dtype, name):
    return TorchBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=dtype, name=name
    )


class SqueezeExcite(nn.Module):
    channels: int
    se_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.se_channels, dtype=self.dtype, name="reduce")(g)
        g = nn.silu(g)
        g = nn.Dense(self.channels, dtype=self.dtype, name="expand")(g)
        return x * nn.sigmoid(g)[:, None, None, :]


class MBConv(nn.Module):
    """Mobile inverted bottleneck: 1x1 expand → depthwise kxk → SE → 1x1
    project, residual when shapes match."""

    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(y)
            y = _bn(train, self.dtype, "expand_bn")(y)
            y = nn.silu(y)
        y = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=self.kernel // 2, feature_group_count=mid, use_bias=False,
            dtype=self.dtype, name="dw_conv",
        )(y)
        y = _bn(train, self.dtype, "dw_bn")(y)
        y = nn.silu(y)
        y = SqueezeExcite(mid, max(1, in_ch // 4), dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
        y = _bn(train, self.dtype, "project_bn")(y)
        if self.stride == 1 and in_ch == self.out_channels:
            y = y + x
        return y


# (expand, channels, repeats, stride, kernel) — published B0 schedule
_B0_CONFIG = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class EfficientNetB0ReID(nn.Module):
    """EfficientNet-B0 trunk + reference ReID head → (B, 1280)."""

    feature: str = "both"
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = nn.silu(x)

        for si, (expand, ch, repeats, stride, kernel) in enumerate(_B0_CONFIG):
            for r in range(repeats):
                x = MBConv(
                    out_channels=ch,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=stride if r == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage{si}_{r}",
                )(x, train)

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = _bn(train, self.dtype, "head_bn")(x)
        x = nn.silu(x)

        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        pooled = {"gap": gap, "gmp": gmp}.get(self.feature, gap + gmp).astype(jnp.float32)
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)
