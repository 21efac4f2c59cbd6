"""DenseNet-121 ReID backbone in flax.

TPU re-implementation of the torchvision DenseNet-121 trunk the reference
wraps (``DenseNet121ReID``, ``Person-ReID/Encoders.py:606-639``): dense
blocks (6/12/24/16 layers, growth 32) → ReLU → GAP+GMP sum → the reference's
quirky channel duplication ``cat([x, x])`` to 2048-d (``Encoders.py:627``) →
BN neck. The optional train-time classifier head (``Encoders.py:616-617,
633-637``) returns (embedding, logits) when ``num_classes`` is set.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm


def _bn(train, dtype, name):
    return TorchBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


class DenseLayer(nn.Module):
    """BN → ReLU → 1x1 (4*growth) → BN → ReLU → 3x3 (growth), concat."""

    growth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = _bn(train, self.dtype, "norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(y)
        y = _bn(train, self.dtype, "norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    """BN → ReLU → 1x1 halve channels → 2x2 avg pool."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _bn(train, self.dtype, "norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet121ReID(nn.Module):
    """DenseNet-121 trunk + reference ReID head → (B, 2048)."""

    block_sizes: tuple = (6, 12, 24, 16)
    growth: int = 32
    num_classes: int = 0  # >0 adds the train-time classifier (Encoders.py:616-617)
    dtype: jnp.dtype = jnp.float32
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = _bn(train, self.dtype, "norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        ch = 64
        for bi, num_layers in enumerate(self.block_sizes, start=1):
            for li in range(num_layers):
                x = DenseLayer(self.growth, dtype=self.dtype, name=f"block{bi}_layer{li}")(x, train)
                ch += self.growth
            if bi < len(self.block_sizes):
                ch //= 2
                x = Transition(ch, dtype=self.dtype, name=f"transition{bi}")(x, train)
        x = _bn(train, self.dtype, "norm_final")(x)
        x = nn.relu(x)  # Encoders.py:622

        pooled = jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2))
        pooled = jnp.concatenate([pooled, pooled], axis=1)  # 1024 → 2048, Encoders.py:627
        pooled = pooled.astype(jnp.float32)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(pooled)

        if self.num_classes and train:
            normed = out / (jnp.linalg.norm(out, axis=1, keepdims=True) + 1e-12)
            logits = nn.Dense(self.num_classes, use_bias=False, dtype=jnp.float32, name="classifier")(normed)
            return out, logits  # Encoders.py:633-637
        return out
