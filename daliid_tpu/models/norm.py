"""Batch normalization with exact torch training semantics.

``flax.linen.BatchNorm`` updates its running variance with the **biased**
batch variance; ``torch.nn.BatchNorm1d/2d`` updates it with the **unbiased**
estimate (factor ``n/(n-1)``) while still normalizing the batch with the
biased one.  The reference's models are torch BN throughout
(``Person-ReID/Encoders.py:327,350`` and every torchvision trunk), and its
EMA/eval flow consumes the running stats directly — so matching the update
rule matters for any train-then-eval parity claim (the composed-pipeline
oracle, ``tests/test_composed_pipeline_oracle.py``, fails without it).

Drop-in replacement for the ``nn.BatchNorm(use_running_average=..., momentum=...,
epsilon=..., dtype=..., name=...)`` call sites in this package; identical
variable naming (``params/{scale,bias}``, ``batch_stats/{mean,var}``) so all
checkpoints and torch converters are unaffected.

Statistics are always computed in float32 (bf16 inputs are upcast), matching
both torch semantics and the TPU-preferred mixed-precision recipe; the output
is cast to ``dtype``.

Under a sharded batch inside ``jit`` the mean/variance reductions are global
across devices (XLA inserts the collectives) — a deliberate improvement over
``nn.DataParallel``'s per-replica statistics (``Encoders.py:39-40``); on a
single device the two coincide, which is what the oracle exercises.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis with torch's running-var rule.

    Normalization (train mode) uses the biased batch variance; the running
    variance is updated with the unbiased one (``n/(n-1)``), exactly as
    ``torch.nn.modules.batchnorm._BatchNorm`` does. ``momentum`` follows the
    flax convention (decay on the OLD value): torch ``momentum=0.1`` ==
    flax/here ``momentum=0.9``.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        reduction_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), self.param_dtype)
        )

        if self.use_running_average:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduction_axes)
            # biased variance for normalization (torch train-mode behavior)
            var = jnp.mean(jnp.square(xf), axis=reduction_axes) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                n = 1
                for a in reduction_axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (m * ra_mean.value + (1.0 - m) * mean).astype(self.param_dtype)
                ra_var.value = (m * ra_var.value + (1.0 - m) * unbiased).astype(self.param_dtype)

        y = (x.astype(jnp.float32) - mean) * scale.astype(jnp.float32) * lax.rsqrt(
            var + self.epsilon
        ) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)
