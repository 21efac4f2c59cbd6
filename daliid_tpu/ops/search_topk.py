"""Fused SQ8 gallery-search kernel: int8 matvec + running top-k in VMEM.

The XLA lowering of the serving search (``eval/matcher.py``) materializes
the full (Q, G) similarity matrix in HBM between the int8 dot and the
top_k — at 4M rows x batch 64 that byproduct is ~1 GB of extra HBM
traffic on top of the 8.6 GB gallery sweep. A ``lax.scan`` rewrite that
avoided the byproduct measured 2.6x SLOWER (BENCH.md: XLA's scan does not
overlap chunk fetches with compute). This Pallas kernel gets both: the
grid pipeline double-buffers gallery chunks HBM→VMEM automatically, and a
chunk's similarities never leave VMEM — TPU grid steps run sequentially,
so the kernel folds each chunk into a running (Q, k) top-k held in the
output refs (same block every step → VMEM-resident until the last step).

``lax.top_k`` has no Mosaic lowering, so selection is k rounds of
max/argmax extraction; the winning index is picked with a masked-max over
an f32-encoded index row (exact for indices < 2^24 — a 4M-row shard is
2^22). HBM traffic ≈ the int8 gallery itself: the bandwidth roofline.

Scope: the SQ8 storage mode (where capacity-scale galleries live); the
f32 mode keeps the XLA path. Used by ``GalleryIndex`` on TPU backends for
shards of >= 2^16 rows; parity vs the XLA kernel is pinned in
``tests/test_matcher.py`` (interpret mode on the CPU mesh), driven
compiled-on-chip at 2^17 rows (identical values/top-1/top-k sets on
unique rows), and the perf delta recorded in BENCH.md (2.06x at batch 64,
~1.1x of the bandwidth roofline). Exactly-tied similarities (e.g.
bit-identical duplicate gallery rows) may order differently than the XLA
top_k — same caveat class as any tie without a stable-sort guarantee.
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


def _kernel(nr_ref, q_ref, g_ref, gs_ref, v_ref, i_ref, *, k: int, chunk: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        v_ref[:] = jnp.full(v_ref.shape, -jnp.inf, jnp.float32)
        i_ref[:] = jnp.zeros(i_ref.shape, jnp.float32)

    # int8 x int8 → int32 on the MXU's double-rate path
    acc = jax.lax.dot_general(
        q_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = acc.astype(jnp.float32) * gs_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + c * chunk
    sims = jnp.where(col < nr_ref[0], sims, -jnp.inf)  # mask padding rows

    # fold this chunk into the running (Q, k) top-k: k rounds of
    # max/argmax over [carry | chunk], index selected by masked max over
    # the f32-encoded index row
    cat_v = jnp.concatenate([v_ref[:], sims], axis=1)
    cat_i = jnp.concatenate([i_ref[:], col.astype(jnp.float32)], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(cat_v, axis=1)
        a = jnp.argmax(cat_v, axis=1).astype(jnp.int32)
        hit = lanes == a[:, None]
        vals.append(m)
        idxs.append(jnp.max(jnp.where(hit, cat_i, -1.0), axis=1))
        cat_v = jnp.where(hit, -jnp.inf, cat_v)
    v_ref[:] = jnp.stack(vals, axis=1)
    i_ref[:] = jnp.stack(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def sq8_search_topk(q8, g8, g_scale, num_real, k: int, chunk: int = CHUNK,
                    interpret: bool = False):
    """→ (vals (Q, k) f32, idx (Q, k) int32) — top-k of the rescaled int8
    similarities over ``g8``'s first ``num_real`` rows.

    ``q8`` (Q, D) int8 probe rows (the probe's own per-row scale is a
    positive constant per row, hence rank-invariant — apply it to the
    returned vals outside). ``g8`` (G, D) int8 with G divisible by
    ``chunk``; ``g_scale`` (G,) f32 per-row scales; ``num_real`` a traced
    scalar (rows beyond it are padding)."""
    qn, d = q8.shape
    g_rows = g8.shape[0]
    if g_rows >= 1 << 24:
        # indices ride an f32 lane inside the kernel — exact only below
        # 2^24; beyond that a shard would silently return corrupted indices
        # (review finding). Shard such galleries over more devices instead.
        raise ValueError(
            f"sq8_search_topk supports shards < 2^24 rows (f32-encoded "
            f"indices); got {g_rows}"
        )
    n_chunks = g_rows // chunk
    gs2 = g_scale.reshape(1, g_rows)
    nr = jnp.reshape(num_real, (1,)).astype(jnp.int32)
    v, i_f32 = pl.pallas_call(
        functools.partial(_kernel, k=k, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qn, d), lambda c: (0, 0)),
            pl.BlockSpec((chunk, d), lambda c: (c, 0)),
            pl.BlockSpec((1, chunk), lambda c: (0, c)),
        ],
        out_specs=(
            pl.BlockSpec((qn, k), lambda c: (0, 0)),
            pl.BlockSpec((qn, k), lambda c: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
        ),
        interpret=interpret,
    )(nr, q8, g8, gs2)
    return v, i_f32.astype(jnp.int32)
