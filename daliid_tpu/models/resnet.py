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


class Bottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: 1x1 → 3x3(stride) → 1x1 with projection
    shortcut on shape change."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
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


class ResNet50ReID(nn.Module):
    """ResNet-50 trunk + ReID head. ``__call__`` → (B, 2048) embedding."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    feature: str = "both"  # 'gap' | 'gmp' | 'both' (evaluateCleanATModels.py:296-388)
    last_stride: int = 1   # Encoders.py:321-322
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1"
        )(x)
        # NOTE: no stem ReLU — matches the reference forward (Encoders.py:332-335).
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        for stage, (num_blocks, p, s) in enumerate(zip(self.stage_sizes, planes, strides), start=1):
            for block in range(num_blocks):
                x = Bottleneck(
                    planes=p,
                    stride=s if block == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage}_{block}",
                )(x, train=train)

        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        if self.feature == "gap":
            pooled = gap
        elif self.feature == "gmp":
            pooled = gmp
        else:
            pooled = gap + gmp  # Encoders.py:341-345

        pooled = pooled.astype(jnp.float32)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)
        return out
