"""Inception-V3 ReID backbone in flax.

TPU re-implementation of the torchvision Inception-V3 trunk the reference
wraps (``inceptionV3ReID``, ``Person-ReID/Encoders.py:686-763``, built at
``Encoders.py:171-192``): the published Inception-V3 stem and mixed blocks
(5b-5d, 6a-6e, 7a-7c) → GAP+GMP sum → 2048-d BN neck. Aux classifier
omitted (the reference wrapper never uses it).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=pad, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


class MixedA(nn.Module):
    """Inception block 5b/5c/5d: 1x1 / 5x5 / double-3x3 / pool branches."""

    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        b1 = c(64, (1, 1), 0, "b1")(x, train)
        b5 = c(48, (1, 1), 0, "b5_1")(x, train)
        b5 = c(64, (5, 5), 2, "b5_2")(b5, train)
        b3 = c(64, (1, 1), 0, "b3_1")(x, train)
        b3 = c(96, (3, 3), 1, "b3_2")(b3, train)
        b3 = c(96, (3, 3), 1, "b3_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = c(self.pool_features, (1, 1), 0, "bp")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):
    """Block 6a: stride-2 3x3 / double-3x3 / maxpool."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv(384, (3, 3), stride=2, dtype=self.dtype, name="b3")(x, train)
        d3 = BasicConv(64, (1, 1), dtype=self.dtype, name="d3_1")(x, train)
        d3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="d3_2")(d3, train)
        d3 = BasicConv(96, (3, 3), stride=2, dtype=self.dtype, name="d3_3")(d3, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, d3, bp], axis=-1)


class MixedB(nn.Module):
    """Blocks 6b-6e: factorized 7x7 branches."""

    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        b1 = c(192, (1, 1), 0, "b1")(x, train)
        b7 = c(c7, (1, 1), 0, "b7_1")(x, train)
        b7 = c(c7, (1, 7), ((0, 0), (3, 3)), "b7_2")(b7, train)
        b7 = c(192, (7, 1), ((3, 3), (0, 0)), "b7_3")(b7, train)
        d7 = c(c7, (1, 1), 0, "d7_1")(x, train)
        d7 = c(c7, (7, 1), ((3, 3), (0, 0)), "d7_2")(d7, train)
        d7 = c(c7, (1, 7), ((0, 0), (3, 3)), "d7_3")(d7, train)
        d7 = c(c7, (7, 1), ((3, 3), (0, 0)), "d7_4")(d7, train)
        d7 = c(192, (1, 7), ((0, 0), (3, 3)), "d7_5")(d7, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = c(192, (1, 1), 0, "bp")(bp, train)
        return jnp.concatenate([b1, b7, d7, bp], axis=-1)


class ReductionB(nn.Module):
    """Block 7a."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, s, p, n: BasicConv(f, k, stride=s, padding=p, dtype=self.dtype, name=n)
        b3 = c(192, (1, 1), 1, 0, "b3_1")(x, train)
        b3 = c(320, (3, 3), 2, 0, "b3_2")(b3, train)
        b7 = c(192, (1, 1), 1, 0, "b7_1")(x, train)
        b7 = c(192, (1, 7), 1, ((0, 0), (3, 3)), "b7_2")(b7, train)
        b7 = c(192, (7, 1), 1, ((3, 3), (0, 0)), "b7_3")(b7, train)
        b7 = c(192, (3, 3), 2, 0, "b7_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class MixedC(nn.Module):
    """Blocks 7b/7c: expanded filter-bank outputs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        b1 = c(320, (1, 1), 0, "b1")(x, train)
        b3 = c(384, (1, 1), 0, "b3_1")(x, train)
        b3a = c(384, (1, 3), ((0, 0), (1, 1)), "b3_2a")(b3, train)
        b3b = c(384, (3, 1), ((1, 1), (0, 0)), "b3_2b")(b3, train)
        d3 = c(448, (1, 1), 0, "d3_1")(x, train)
        d3 = c(384, (3, 3), 1, "d3_2")(d3, train)
        d3a = c(384, (1, 3), ((0, 0), (1, 1)), "d3_3a")(d3, train)
        d3b = c(384, (3, 1), ((1, 1), (0, 0)), "d3_3b")(d3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = c(192, (1, 1), 0, "bp")(bp, train)
        return jnp.concatenate([b1, b3a, b3b, d3a, d3b, bp], axis=-1)


class InceptionV3ReID(nn.Module):
    """Inception-V3 trunk + reference ReID head → (B, 2048).

    Note: the stem downsamples aggressively (stride-2 conv, two pools);
    inputs smaller than ~75px collapse — use the standard 256x128 re-ID
    resolution or larger.
    """

    feature: str = "both"
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = BasicConv(32, (3, 3), stride=2, dtype=self.dtype, name="Conv2d_1a")(x, train)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a")(x, train)
        x = BasicConv(64, (3, 3), padding=1, dtype=self.dtype, name="Conv2d_2b")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b")(x, train)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x = MixedA(32, dtype=self.dtype, name="Mixed_5b")(x, train)
        x = MixedA(64, dtype=self.dtype, name="Mixed_5c")(x, train)
        x = MixedA(64, dtype=self.dtype, name="Mixed_5d")(x, train)
        x = ReductionA(dtype=self.dtype, name="Mixed_6a")(x, train)
        x = MixedB(128, dtype=self.dtype, name="Mixed_6b")(x, train)
        x = MixedB(160, dtype=self.dtype, name="Mixed_6c")(x, train)
        x = MixedB(160, dtype=self.dtype, name="Mixed_6d")(x, train)
        x = MixedB(192, dtype=self.dtype, name="Mixed_6e")(x, train)
        x = ReductionB(dtype=self.dtype, name="Mixed_7a")(x, train)
        x = MixedC(dtype=self.dtype, name="Mixed_7b")(x, train)
        x = MixedC(dtype=self.dtype, name="Mixed_7c")(x, train)

        gap = jnp.mean(x, axis=(1, 2))
        gmp = jnp.max(x, axis=(1, 2))
        pooled = {"gap": gap, "gmp": gmp}.get(self.feature, gap + gmp).astype(jnp.float32)
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)
