"""Int8 post-training quantization for the inference path (beyond-reference).

The reference serves fp32 CUDA inference (``Person-ReID/getFeatures.py``)
and has no quantization story. On TPU v5e the MXU runs int8 at twice the
bf16 rate, and the measured hot convs of the flagship extraction forward
speed up 1.1-1.5x at the bench shapes (``tools/bench_int8_mxu.py``,
xprof device-time methodology), so an int8 path is a real serving lever.

Design — symmetric per-tensor-activation / per-channel-weight PTQ, applied
through `flax.linen` **method interception** so every model in the zoo is
covered without touching model code:

- :func:`calibrate` runs one forward pass with an interceptor that ``sow``s
  each ``nn.Conv`` input's absolute maximum into a ``quant_stats``
  collection (fully jit-compatible — the stats come back as the mutated
  collection), then flattens it to ``{module-path: absmax}``.
- :func:`quantized_apply` (or the raw :func:`make_quantized_interceptor`)
  re-runs the model with each ``nn.Conv.__call__`` replaced by:
  quantize the input with the calibrated per-tensor scale, quantize the
  kernel per-output-channel, run the convolution in int8 with int32
  accumulation (the MXU's double-rate mode), dequantize in f32, add the
  bias, and cast back to the module's compute dtype. Batch-norm, ReLU,
  pooling and every other op stay in the original dtype and fuse as usual.
- ``nn.Dense`` layers (the ViT/TransReID qkv / attention-proj / MLP
  matmuls — where that family's FLOPs live) also run int8. Calibrated
  layers use a **static per-tensor** activation scale so the quantize
  fuses into the producer's epilogue (GELU / LayerNorm) with no extra
  HBM pass — measured necessary on the wide-K fc2 matmul, where a
  dynamic per-row absmax pass costs more than the int8 win
  (``tools/bench_int8_mxu.py``: fc2 dynq8 0.71x bf16 vs static-int8
  2.0x). Uncalibrated Dense layers fall back to dynamic per-row
  (per-token) scales, which factor out of the contraction exactly and
  need no calibration. Matmuls smaller than an MXU tile on either side
  (``dense_min_dim``) stay in fp — quantizing the SE-gate vectors of
  OSNet/EfficientNet costs more in quantize glue than the tiny matmul.

Accuracy: end-to-end CMC/mAP parity bands vs the fp forward are pinned in
``tests/test_quantize.py`` on trained synthetic-set models.

Only the convolution configurations the zoo actually uses are supported
(int / 'SAME' / 'VALID' padding, strides, ``feature_group_count``,
optional bias); anything else (dilation, string paddings beyond
SAME/VALID) raises loudly rather than silently running un-quantized.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

STATS_COLLECTION = "quant_stats"


def _degenerate_scale(absmax) -> bool:
    """True for a CONCRETE scalar <= 0 — degenerate calibration, fall back
    to dynamic scales. Traced values (scales passed as jit arguments, the
    zero-recompile mining-recalibration path) cannot be branched on at
    trace time and are assumed valid; their producers filter ``v > 0`` on
    the host. Accepts any host scalar type (Python numbers, numpy scalars,
    concrete 0-d arrays) — an ``isinstance(int, float)`` check would
    silently drop the guard for ``np.float32``."""
    if isinstance(absmax, jax.core.Tracer):
        return False
    try:
        return float(absmax) <= 0.0
    except (TypeError, ValueError):
        return False


def _module_path(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _conv_lax_config(mod: nn.Conv, ndim_spatial: int):
    """Translate the ``nn.Conv`` attributes this zoo uses into
    ``lax.conv_general_dilated`` arguments; raise on anything else."""
    if ndim_spatial != 2:
        raise NotImplementedError(f"int8 path supports 2D convs, got {ndim_spatial}D")

    def _pair(v):
        if isinstance(v, int):
            return (v, v)
        return tuple(v)

    strides = _pair(mod.strides if mod.strides is not None else 1)

    pad = mod.padding
    if isinstance(pad, str):
        if pad.upper() not in ("SAME", "VALID"):
            raise NotImplementedError(f"int8 path: unsupported padding {pad!r}")
        padding = pad.upper()
    elif isinstance(pad, int):
        padding = [(pad, pad)] * 2
    else:  # sequence of ints or of (lo, hi) pairs
        padding = [(p, p) if isinstance(p, int) else tuple(p) for p in pad]

    for attr in ("kernel_dilation", "input_dilation"):
        v = getattr(mod, attr, None)
        if v is not None and any(d != 1 for d in _pair(v)):
            raise NotImplementedError(f"int8 path: {attr}={v} unsupported")
    return strides, padding, int(mod.feature_group_count)


def _quantize_sym(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 quantization (f32 math for exact rounding)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


def calibration_interceptor(next_fun, args, kwargs, context):
    """Record each ``nn.Conv``/``nn.Dense`` input's absmax into
    ``quant_stats``."""
    mod = context.module
    if isinstance(mod, (nn.Conv, nn.Dense)) and context.method_name == "__call__":
        absmax = jnp.max(jnp.abs(args[0])).astype(jnp.float32)
        mod.sow(
            STATS_COLLECTION,
            "in_absmax",
            absmax,
            reduce_fn=jnp.maximum,
            init_fn=lambda: jnp.zeros((), jnp.float32),
        )
    return next_fun(*args, **kwargs)


def flatten_stats(tree, prefix=()) -> Dict[str, Any]:
    """``quant_stats`` collection → ``{module-path: absmax}`` (array leaves)."""
    flat: Dict[str, Any] = {}
    for key, val in tree.items():
        if isinstance(val, dict):
            flat.update(flatten_stats(val, prefix + (key,)))
        else:  # leaf: the sown "in_absmax" value
            flat["/".join(prefix)] = val
    return flat


def calibrate(module, variables, *args, jit: bool = True, **kwargs) -> Dict[str, float]:
    """One forward pass → ``{conv-module-path: input absmax}`` (host floats).

    ``args``/``kwargs`` are forwarded to ``module.apply`` (e.g. the image
    batch, ``train=False``, ``camera_ids=...``). Use a representative data
    batch — the scales are baked into the quantized program.

    The intercepted forward runs under ``jax.jit`` by default (one compiled
    dispatch instead of thousands of eager ops through the device tunnel);
    kwargs become trace-time constants, which is fine for a one-shot
    calibration pass. This is the single calibration implementation — the
    FeatureExtractor, bench.py and the profiling tools all route here.
    """

    def run(variables, *a):
        with nn.intercept_methods(calibration_interceptor):
            _, stats = module.apply(
                variables, *a, mutable=[STATS_COLLECTION], **kwargs
            )
        return stats

    stats = (jax.jit(run) if jit else run)(variables, *args)
    flat = flatten_stats(jax.device_get(stats[STATS_COLLECTION]))
    return {k: float(v) for k, v in flat.items()}


def _result_dtype(mod, x, w):
    """The dtype the unquantized module would have returned: ``mod.dtype``
    when set; otherwise flax's promote-dtype rule (``dtype=None`` promotes
    input and param dtypes — e.g. f32 params + bf16 input → f32)."""
    if mod.dtype is not None:
        return mod.dtype
    return jnp.result_type(x.dtype, w.dtype)


def _quantized_dense(mod: nn.Dense, x: jax.Array, absmax) -> jax.Array:
    """``nn.Dense`` in int8.

    With a calibrated ``absmax`` the activation scale is per-tensor (a
    scalar — float constant or traced scalar, both fuse as one broadcasted
    multiply), so the quantize fuses into the producer's epilogue
    (GELU / LayerNorm) with no extra HBM pass — measured necessary for the
    wide-K fc2 matmul, where a dynamic absmax pass costs more than the
    int8 win (tools/bench_int8_mxu.py: fc2 dynq8 0.71x bf16, static-int8
    2.0x). Without calibration the scale is the dynamic per-row absmax,
    which factors out of the contraction exactly: ``acc * s_in[r] * s_w[o]``.
    """
    w = mod.get_variable("params", "kernel")  # (in, out)
    if absmax is not None:
        s_in = jnp.maximum(jnp.float32(absmax), 1e-12) / 127.0
    else:
        s_in = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        s_in = jnp.maximum(s_in, jnp.float32(1e-12))
    xq = _quantize_sym(x, s_in)
    s_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, jnp.float32(1e-12))
    wq = _quantize_sym(w, s_w)

    acc = lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_in * s_w  # (..., 1) x (1, out) broadcast
    if mod.use_bias:
        out = out + mod.get_variable("params", "bias").astype(jnp.float32)
    return out.astype(_result_dtype(mod, x, w))


def make_quantized_interceptor(
    scales: Dict[str, float],
    skip: Callable[[str], bool] | None = None,
    dense: bool = True,
    dense_min_dim: int = 128,
):
    """Interceptor replacing each calibrated ``nn.Conv`` with int8 compute.

    ``skip(path) -> True`` keeps that conv in the original dtype. Convs
    missing from ``scales`` (or with an all-zero calibration input) also
    fall through to the original computation.

    With ``dense=True`` (default), ``nn.Dense`` layers whose matmul spans at
    least ``dense_min_dim`` (one MXU tile) on both sides also run int8, with
    dynamic per-row activation scales — no calibration entry required.

    ``scales`` values may be host floats (baked as program constants — the
    eval-CLI path) or traced jnp scalars (passed through a jit boundary so
    RECALIBRATION reuses one compiled program — the per-epoch mining path,
    ``eval/features.py``). Traced scales must be pre-filtered for
    degenerate (<= 0) entries by the caller: key presence is structural,
    the value is not inspectable at trace time.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not context.method_name == "__call__":
            return next_fun(*args, **kwargs)
        if dense and isinstance(mod, nn.Dense):
            x = args[0]
            d_in, d_out = x.shape[-1], int(mod.features)
            path = _module_path(mod)
            if (
                d_in >= dense_min_dim
                and d_out >= dense_min_dim
                and not (skip is not None and skip(path))
            ):
                absmax = scales.get(path)
                if _degenerate_scale(absmax):
                    absmax = None  # degenerate calibration → dynamic scales
                return _quantized_dense(mod, x, absmax)
            return next_fun(*args, **kwargs)
        if not isinstance(mod, nn.Conv):
            return next_fun(*args, **kwargs)
        path = _module_path(mod)
        absmax = scales.get(path)
        if (
            absmax is None
            or _degenerate_scale(absmax)
            or (skip is not None and skip(path))
        ):
            return next_fun(*args, **kwargs)
        if getattr(mod, "mask", None) is not None:
            # a masked conv's kernel mask would be silently dropped by the
            # raw lax call below — keep it in the original dtype instead
            return next_fun(*args, **kwargs)

        x = args[0]
        w = mod.get_variable("params", "kernel")  # HWIO
        strides, padding, groups = _conv_lax_config(mod, x.ndim - 2)

        s_in = jnp.float32(absmax) / 127.0
        xq = _quantize_sym(x, s_in)
        # per-output-channel symmetric weight scales
        s_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True) / 127.0
        s_w = jnp.maximum(s_w, jnp.float32(1e-12))
        wq = _quantize_sym(w, s_w)

        out = lax.conv_general_dilated(
            xq,
            wq,
            strides,
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        out = out.astype(jnp.float32) * (s_in * s_w[0])  # (1,1,O) broadcast
        if mod.use_bias:
            out = out + mod.get_variable("params", "bias").astype(jnp.float32)
        return out.astype(_result_dtype(mod, x, w))

    return interceptor


def quantized_apply(
    module,
    variables,
    scales: Dict[str, float],
    *args,
    skip: Callable[[str], bool] | None = None,
    dense: bool = True,
    dense_min_dim: int = 128,
    **kwargs,
):
    """``module.apply`` with every calibrated conv (and, by default, every
    MXU-sized ``nn.Dense``) running in int8."""
    interceptor = make_quantized_interceptor(
        scales, skip=skip, dense=dense, dense_min_dim=dense_min_dim
    )
    with nn.intercept_methods(interceptor):
        return module.apply(variables, *args, **kwargs)
