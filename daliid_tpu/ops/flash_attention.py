"""Fused multi-head attention as a Pallas TPU kernel.

The ViT/TransReID backbones attend over short token sequences (129-211
tokens at 256x128 inputs — SURVEY.md §5 notes sequence parallelism is out of
scope at this length). At this size the winning schedule is not a streaming
flash decomposition but a *fully fused* kernel: one program per (batch x
head) computes QK^T, the numerically-stable softmax, and PV entirely in
VMEM — zero HBM round-trips for the (N, N) score matrix, both matmuls on
the MXU.

Sequence and head dims are padded to lane/sublane multiples at trace time;
padded key columns are masked with -inf before the softmax (static mask —
token count is a compile-time constant for a fixed image size). Exposed with
a custom VJP whose backward recomputes the (N, N) probabilities in-kernel —
the flash-style trade of FLOPs for HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N_pad, N_pad)

    n_pad = s.shape[1]
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < n_real, s, -jnp.inf)

    s_max = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = p / denom

    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention(q, k, v, n_real: int, scale: float, interpret: bool):
    bh, n_pad, d_pad = q.shape
    grid = (bh,)
    spec = pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attention_kernel, n_real=n_real, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * n_pad * n_pad * d_pad,
            bytes_accessed=4 * bh * n_pad * d_pad * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_core(q, k, v, interpret):
    return _fwd_impl(q, k, v, interpret)


def _fwd_impl(q, k, v, interpret):
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)

    def prep(t):
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, n, d)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    o = _fused_attention(prep(q), prep(k), prep(v), n, scale, interpret)
    o = o[:, :n, :d].reshape(b, h, n, d)
    return jnp.transpose(o, (0, 2, 1, 3))


def _fwd(q, k, v, interpret):
    return _fwd_impl(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    # Recompute probabilities (flash-style) with plain XLA ops — the
    # backward runs once per step and XLA fuses it well at N<=256.
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    q32, k32, v32, g32 = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bnhd,bmhd->bhnm", q32, k32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, g32)
    dp = jnp.einsum("bnhd,bmhd->bhnm", g32, v32)
    dot = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - dot)
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, k32) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, q32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_core.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, interpret: bool | None = None):
    """Fused attention over (B, N, H, D) q/k/v → (B, N, H, D).

    Drop-in for ``jax.nn.dot_product_attention`` at re-ID sequence lengths.
    ``interpret`` defaults to True off-TPU (tests on the virtual CPU mesh)
    and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention_core(q, k, v, interpret)
