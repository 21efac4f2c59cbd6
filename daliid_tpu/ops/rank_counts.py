"""Pallas counting-rank kernel: positive kept-rank counts in one distmat sweep.

The eval tail's sort-free CMC/mAP (``metrics/ranking.py``) spends its time
computing, for every (query, positive) pair, the COUNT of kept gallery
entries ranked before the positive under the protocol's stable order
(distance, then gallery index) — the semantics of torchreid's Cython
``evaluate_cy`` as invoked at ``Person-ReID/validateModels.py:68``. The XLA
formulation (``_rank_chunk_counting``) is a ``lax.map``-of-``lax.scan``
whose measured time at DeepChange scale (17.5k x 63k, P≈160) is ~4x its
VPU compare roofline: per-chunk dispatch overhead, the block transpose
materialization, and the (B, G_blk, P) boolean intermediate all cost HBM
traffic the math doesn't need.

This kernel streams the distmat through VMEM and keeps everything else
resident. **Transposed layout**: queries ride the 128-lane axis and the
gallery the sublane axis, so each positive threshold is a (1, BQ) lane row
broadcasting against the (BG, BQ) distance block, and the per-positive
count is a sublane reduction — every block shape is Mosaic-legal and every
op a natural VPU broadcast.

**Grid** ``(n_q_tiles, n_g_blocks, n_p_chunks)`` — positive chunks
INNERMOST:

- the distᵀ block ``(BG, BQ) @ (j, i)`` has a constant index map across
  the inner k sweep, so each block is fetched from HBM exactly ONCE
  (double-buffered against the previous block's last k step) — the
  distmat streams through VMEM a single time regardless of P;
- the full counts output block ``(P_pad, BQ) @ (0, i)`` is constant
  across BOTH inner dimensions, accumulating in VMEM for the whole
  (i)-tile and written to HBM once; each step adds its (PC, BQ) slice;
- the junk-masked distances are computed once per (i, j) at ``k == 0``
  and cached in a ``(BG, BQ)`` VMEM scratch for the remaining k steps.

**Per step**: junk entries (same pid AND same camid as the query — the
Market protocol, ``evaluate_cy``'s ``keep`` mask) are pushed to ``+inf``
once, then each of the PC positives does a broadcast compare
``(d < p) | ((d == p) & (g_idx < p_idx))`` and a sublane reduction — the
stable-order count, bit-exact on ties vs the numpy/C++ oracles (fuzzed in
``tests/test_metrics.py``). ``ignore_camera`` (the BRIAR convention,
``validateModels.py:84-105``) drops the junk masking at compile time.

Padding contract (handled here): padded gallery rows carry ``+inf``
distance (never "before" anything), padded query columns / positive slots
produce garbage counts that the caller masks exactly like the XLA path
does (``posmask``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (2048, 256) f32 distᵀ block = 2 MB; two in flight + the resident
# counts/threshold blocks stay well under the ~16 MB/core VMEM budget
_BQ = 256
_BG = 2048
_PC = 32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(dist_ref, pd_ref, pi_ref, qp_ref, qc_ref, gp_ref, gc_ref,
            out_ref, kd_ref, *, bg: int, pc: int, ignore_camera: bool):
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(k == 0)
    def _():
        # junk-masked distances once per (i, j) block, cached for all
        # positive chunks: junk = same pid AND same camid as the query
        if ignore_camera:
            kd_ref[:] = dist_ref[:]
        else:
            junk = (gp_ref[:] == qp_ref[:]) & (gc_ref[:] == qc_ref[:])
            kd_ref[:] = jnp.where(junk, jnp.inf, dist_ref[:])

    kd = kd_ref[:]                                     # (BG, BQ) f32
    gi = j * bg + jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0)

    rows = []
    for kk in range(pc):                               # static unroll
        p = pd_ref[kk:kk + 1, :]                       # (1, BQ) f32
        px = pi_ref[kk:kk + 1, :]                      # (1, BQ) i32
        before = (kd < p) | ((kd == p) & (gi < px))
        rows.append(jnp.sum(before.astype(jnp.int32), axis=0, keepdims=True))
    sl = pl.ds(pl.multiple_of(k * pc, pc), pc)
    out_ref[sl, :] = out_ref[sl, :] + jnp.concatenate(rows, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("ignore_camera", "interpret", "bq", "bg", "pc"),
)
def positive_rank_counts(
    dist: jnp.ndarray,      # (Q, G) f32 distance matrix
    p_dist: jnp.ndarray,    # (Q, P) f32 positive distances (+inf pad slots)
    p_idx: jnp.ndarray,     # (Q, P) i32 positive gallery indices (i32max pad)
    q_pids: jnp.ndarray,    # (Q,) i32
    q_camids: jnp.ndarray,  # (Q,) i32
    g_pids: jnp.ndarray,    # (G,) i32
    g_camids: jnp.ndarray,  # (G,) i32
    ignore_camera: bool = False,
    interpret: bool = False,
    bq: int = _BQ,
    bg: int = _BG,
    pc: int = _PC,
) -> jnp.ndarray:
    """→ counts (Q, P) int32: kept gallery entries before each positive in
    the stable (distance, gallery-index) order. Counts at invalid positive
    slots (``p_dist=+inf``) are garbage — mask them like the XLA path.

    The (Q, G) input is transposed once in XLA (~10 ms of HBM traffic at
    DeepChange scale) into the kernel's lane-friendly layout.
    """
    Q, G = dist.shape
    P = p_dist.shape[1]
    bq = min(bq, _round_up(max(Q, 1), 128))
    bg = min(bg, _round_up(max(G, 1), 8))
    pc = min(pc, _round_up(max(P, 1), 8))

    qp = _round_up(Q, bq) - Q
    gp = _round_up(G, bg) - G
    pp = _round_up(P, pc) - P
    dist_t = jnp.pad(dist.T, ((0, gp), (0, qp)), constant_values=jnp.inf)
    pd_t = jnp.pad(p_dist.T, ((0, pp), (0, qp)), constant_values=jnp.inf)
    pi_t = jnp.pad(p_idx.T, ((0, pp), (0, qp)),
                   constant_values=jnp.iinfo(jnp.int32).max)
    qpid = jnp.pad(q_pids.astype(jnp.int32), (0, qp), constant_values=-1)[None, :]
    qcam = jnp.pad(q_camids.astype(jnp.int32), (0, qp), constant_values=-1)[None, :]
    gpid = jnp.pad(g_pids.astype(jnp.int32), (0, gp), constant_values=-2)[:, None]
    gcam = jnp.pad(g_camids.astype(jnp.int32), (0, gp), constant_values=-2)[:, None]

    nq = dist_t.shape[1] // bq
    nk = pd_t.shape[0] // pc
    ng = dist_t.shape[0] // bg

    p_pad = pd_t.shape[0]
    counts_t = pl.pallas_call(
        functools.partial(_kernel, bg=bg, pc=pc, ignore_camera=ignore_camera),
        grid=(nq, ng, nk),
        in_specs=[
            pl.BlockSpec((bg, bq), lambda i, j, k: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, bq), lambda i, j, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, bq), lambda i, j, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p_pad, bq), lambda i, j, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, dist_t.shape[1]), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bg, bq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * dist_t.shape[0] * dist_t.shape[1] * p_pad,
            bytes_accessed=4 * dist_t.shape[0] * dist_t.shape[1],
            transcendentals=0,
        ),
        interpret=interpret,
    )(dist_t, pd_t, pi_t, qpid, qcam, gpid, gcam)
    return counts_t[:P, :Q].T
