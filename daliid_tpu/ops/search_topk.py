"""Fused gallery-search kernel: matvec + running top-k in VMEM.

The XLA lowering of the serving search (``eval/matcher.py``) materializes
the full (Q, G) similarity matrix in HBM between the dot and the top_k —
at 4M rows x batch 64 that byproduct is ~1 GB of extra HBM traffic on top
of the 8.6 GB gallery sweep. A ``lax.scan`` rewrite that avoided the
byproduct measured 2.6x SLOWER (BENCH.md: XLA's scan does not overlap
chunk fetches with compute). This Pallas kernel gets both: the grid
pipeline double-buffers gallery chunks HBM→VMEM automatically, and a
chunk's similarities never leave VMEM.

**Grid layout** (round 4: probe tiling, lifting the old 128-probe cap).
``grid = (n_chunks, n_q_tiles)`` — gallery chunk OUTER, probe tile INNER:

- the gallery chunk block's index map is constant across the inner probe
  steps, so each chunk is fetched from HBM exactly ONCE regardless of Q
  (probe-outer would re-sweep the gallery per tile);
- the running (Q_pad, k) top-k carry lives in the two output blocks with a
  CONSTANT index map — one VMEM-resident buffer for the whole grid (TPU
  grid steps run sequentially), written back to HBM once at the end. Each
  step folds its chunk into rows ``[qi*q_tile, (qi+1)*q_tile)`` via a
  dynamic slice. Probe tiles bound the per-step working set (the
  (q_tile, chunk) similarity block + the [carry | chunk] concat), so VMEM
  stays ~12 MB at q_tile=128 while Q itself can grow to ``MAX_PROBES``
  (the carry is Q·k·8 bytes — 2 MB at Q=4096, k=64).

``lax.top_k`` has no Mosaic lowering, so selection is k rounds of
max/argmax extraction; the winning index is picked with a masked-max over
an f32-encoded index row (exact for indices < 2^24 — a 4M-row shard is
2^22). HBM traffic ≈ the gallery itself: the bandwidth roofline.

Two storage modes share the kernel body (static ``quantized`` flag):

- **SQ8** (``sq8_search_topk``): int8 x int8 → int32 on the MXU's
  double-rate path, rescaled by the gallery's per-row scales in VMEM; the
  probe's own per-row scale is a positive constant per row, hence
  rank-invariant — applied to the returned vals by the caller.
- **f32** (``f32_search_topk``): direct f32 dot, no scales; chunk is 4x
  smaller (same 4 MB block bytes at D=2048).

Used by ``GalleryIndex`` on TPU backends (``eval/matcher.py`` gates);
parity vs the XLA kernel is pinned in ``tests/test_matcher.py``
(interpret mode on the CPU mesh, incl. Q > 128 multi-tile and f32),
driven compiled-on-chip, and the perf deltas recorded in BENCH.md.
Exactly-tied similarities (e.g. bit-identical duplicate gallery rows) may
order differently than the XLA top_k — same caveat class as any tie
without a stable-sort guarantee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# gallery rows per grid step: (2048, 2048) int8 = 4 MB — two blocks in
# flight stay well under the ~16 MB/core VMEM budget
CHUNK = 2048
# f32 rows per grid step: (512, 2048) f32 = the same 4 MB block
F32_CHUNK = 512
# probe rows folded per inner grid step
Q_TILE = 128
# probe cap: keeps the VMEM-resident (Q_pad, k) f32 carry pair <= 4 MB at
# k = 64. Larger probe batches take the XLA path, which amortizes its
# (Q, G) byproduct at large Q anyway (BENCH.md).
MAX_PROBES = 4096


def _kernel(nr_ref, q_ref, g_ref, gs_ref, v_ref, i_ref, *,
            k: int, chunk: int, q_tile: int, quantized: bool):
    c = pl.program_id(0)   # gallery chunk (outer: each chunk fetched once)
    qi = pl.program_id(1)  # probe tile (inner)
    rows = pl.ds(pl.multiple_of(qi * q_tile, q_tile), q_tile)

    @pl.when(c == 0)
    def _init():
        v_ref[rows, :] = jnp.full((q_tile, k), -jnp.inf, jnp.float32)
        i_ref[rows, :] = jnp.zeros((q_tile, k), jnp.float32)

    if quantized:
        # int8 x int8 → int32 on the MXU's double-rate path
        acc = jax.lax.dot_general(
            q_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sims = acc.astype(jnp.float32) * gs_ref[0, :][None, :]
    else:
        sims = jax.lax.dot_general(
            q_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + c * chunk
    sims = jnp.where(col < nr_ref[0], sims, -jnp.inf)  # mask padding rows

    # fold this chunk into the tile's running (q_tile, k) top-k: k rounds
    # of max/argmax over [carry | chunk], index selected by masked max
    # over the f32-encoded index row
    cat_v = jnp.concatenate([v_ref[rows, :], sims], axis=1)
    cat_i = jnp.concatenate([i_ref[rows, :], col.astype(jnp.float32)], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(cat_v, axis=1)
        a = jnp.argmax(cat_v, axis=1).astype(jnp.int32)
        hit = lanes == a[:, None]
        vals.append(m)
        idxs.append(jnp.max(jnp.where(hit, cat_i, -1.0), axis=1))
        cat_v = jnp.where(hit, -jnp.inf, cat_v)
    v_ref[rows, :] = jnp.stack(vals, axis=1)
    i_ref[rows, :] = jnp.stack(idxs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "q_tile", "quantized", "interpret")
)
def _search_topk(q, g, g_scale, num_real, k: int, chunk: int, q_tile: int,
                 quantized: bool, interpret: bool):
    qn, d = q.shape
    g_rows = g.shape[0]
    if g_rows >= 1 << 24:
        # indices ride an f32 lane inside the kernel — exact only below
        # 2^24; beyond that a shard would silently return corrupted indices
        # (review finding). Shard such galleries over more devices instead.
        raise ValueError(
            f"search_topk supports shards < 2^24 rows (f32-encoded "
            f"indices); got {g_rows}"
        )
    if qn > MAX_PROBES:
        raise ValueError(f"search_topk supports at most {MAX_PROBES} probe "
                         f"rows per call; got {qn} (use the XLA path)")
    qt = min(q_tile, qn)
    n_tiles = -(-qn // qt)
    q_pad = n_tiles * qt
    if q_pad != qn:  # zero rows: garbage results, sliced off below
        q = jnp.concatenate(
            [q, jnp.zeros((q_pad - qn, d), q.dtype)], axis=0
        )
    n_chunks = g_rows // chunk
    gs2 = g_scale.reshape(1, g_rows)
    nr = jnp.reshape(num_real, (1,)).astype(jnp.int32)
    v, i_f32 = pl.pallas_call(
        functools.partial(_kernel, k=k, chunk=chunk, q_tile=qt,
                          quantized=quantized),
        grid=(n_chunks, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda c, qi: (qi, 0)),
            pl.BlockSpec((chunk, d), lambda c, qi: (c, 0)),
            pl.BlockSpec((1, chunk), lambda c, qi: (0, c)),
        ],
        out_specs=(
            # constant index map: ONE VMEM-resident carry for the whole
            # grid, flushed to HBM once after the last step
            pl.BlockSpec((q_pad, k), lambda c, qi: (0, 0)),
            pl.BlockSpec((q_pad, k), lambda c, qi: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
        ),
        interpret=interpret,
    )(nr, q, g, gs2)
    return v[:qn], i_f32[:qn].astype(jnp.int32)


def sq8_search_topk(q8, g8, g_scale, num_real, k: int, chunk: int = CHUNK,
                    q_tile: int = Q_TILE, interpret: bool = False):
    """→ (vals (Q, k) f32, idx (Q, k) int32) — top-k of the rescaled int8
    similarities over ``g8``'s first ``num_real`` rows.

    ``q8`` (Q, D) int8 probe rows, Q <= ``MAX_PROBES`` (the probe's own
    per-row scale is rank-invariant — apply it to the returned vals
    outside). ``g8`` (G, D) int8 with G divisible by ``chunk``;
    ``g_scale`` (G,) f32 per-row scales; ``num_real`` a traced scalar
    (rows beyond it are padding)."""
    return _search_topk(q8, g8, g_scale, num_real, k, chunk, q_tile,
                        quantized=True, interpret=interpret)


def f32_search_topk(q, g, num_real, k: int, chunk: int = F32_CHUNK,
                    q_tile: int = Q_TILE, interpret: bool = False,
                    g_scale=None):
    """f32 storage mode: → (vals, idx) like ``sq8_search_topk`` but over an
    f32 gallery, no scales. ``g_scale`` is an ignored (G,) f32 placeholder
    row (the kernel keeps one signature); pass the caller's cached zeros —
    ``GalleryIndex`` already holds one — to avoid re-materializing 4·G
    bytes per call at capacity scale."""
    if g_scale is None:
        g_scale = jnp.zeros(g.shape[0], jnp.float32)
    return _search_topk(q, g, g_scale, num_real, k, chunk, q_tile,
                        quantized=False, interpret=interpret)
