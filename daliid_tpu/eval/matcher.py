"""Gallery index + sharded identity search — the serving path.

The reference's "serving" story is batch evaluation scripts; production
identification needs a resident gallery and low-latency probes. This module
keeps the L2-normalized gallery embedding matrix device-resident, sharded
over the ``data`` mesh axis, and answers probes with one fused program:

    local scores (Q, G/n) → local top-k → all_gather over ICI → merged top-k

implemented with ``shard_map`` so the collective is explicit and rides ICI
(SURVEY.md §2.3's TPU plan). Single-chip meshes degenerate to a plain
matmul + top_k.

``quantize="int8"`` stores the device-resident gallery as symmetric
per-row int8 (scalar quantization): 4x the enrolled identities per chip of
HBM, and the probe·gallery scores run in the MXU's double-rate
int8 x int8 → int32 mode. Cosine error from SQ8 on L2-normalized rows is
bounded by ~D·(absmax/127)·quant-noise — a few 1e-3 at ReID feature dims —
far inside typical identity margins (parity pinned by
tests/test_matcher.py). The host-side f32 copy backing add/remove and
save/load is unchanged, so enrollment churn and persistence are exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from daliid_tpu.parallel.mesh import make_mesh, put_global

# Pallas search kernel gate (ops/search_topk.py): "auto" = on for TPU
# backends, "0"/"1" force, "interpret" runs the kernel interpreted (tests).
# The kernel engages only for shards of >= _PALLAS_MIN_SHARD rows (int8 or
# f32 storage) — below that the XLA path's (Q, G) byproduct is too small
# to matter.
_PALLAS_MIN_SHARD = 1 << 16


def _pallas_search_mode() -> str:
    mode = os.environ.get("DALIID_SEARCH_PALLAS", "auto")
    if mode == "auto":
        return "1" if jax.default_backend() == "tpu" else "0"
    return mode


def _quantize_rows(x: np.ndarray, _chunk: int = 1 << 16) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: q = round(x / s), s = absmax/127 per row.

    Chunked over rows with preallocated outputs: a whole-matrix expression
    would materialize three f32 temporaries of x's size — at multi-million-
    row gallery scale (the whole point of SQ8) that's ~100 GB of peak host
    RAM for a 34 GB input. Chunking bounds the temporaries to ~0.5 GB and is
    cache-friendlier besides."""
    n = x.shape[0]
    q = np.empty(x.shape, np.int8)
    scale = np.empty(n, np.float32)
    for i in range(0, n, _chunk):
        blk = x[i : i + _chunk]
        s = np.abs(blk).max(axis=1) / 127.0
        s = np.maximum(s, 1e-12, dtype=np.float32)
        t = np.rint(blk / s[:, None])
        np.clip(t, -127, 127, out=t)
        q[i : i + _chunk] = t
        scale[i : i + _chunk] = s
    return q, scale


def serving_embedding(fvs) -> np.ndarray:
    """One (N, D) serving vector per image from an extractor output.

    Multi-head models (multipart / dual / TransReID-JPM) return a tuple of
    head features (``eval/features.py:255-267``); for serving, heads
    concatenate along the feature axis — cosine over the concat is exactly
    the concat fusion protocol (``eval/fusion.py:29-41``, the reference's
    ``evaluateCleanATModels.py`` concat mode) once the index L2-normalizes.
    Single-head arrays pass through."""
    if isinstance(fvs, (tuple, list)):
        return np.concatenate([np.asarray(f, np.float32) for f in fvs], axis=1)
    return np.asarray(fvs, np.float32)


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_rows(gallery, block, offset):
    """In-place enrollment: write ``block`` rows at ``offset`` into the
    donated device gallery — O(new rows) transfer instead of re-uploading
    the whole matrix (at capacity scale that difference is 8.6 GB vs a few
    KB per add). Caller guarantees offset + len(block) <= capacity (XLA
    clamps out-of-range starts, which would silently shift the write onto
    valid rows)."""
    return jax.lax.dynamic_update_slice(gallery, block, (offset, jnp.int32(0)))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _append_rows_q8(gallery, scales, q_block, s_block, offset):
    g = jax.lax.dynamic_update_slice(gallery, q_block, (offset, jnp.int32(0)))
    s = jax.lax.dynamic_update_slice(scales, s_block, (offset,))
    return g, s


class GalleryIndex:
    """Device-resident searchable gallery with incremental enrollment.

    ``add``/``remove`` support live gallery churn (enroll/retire
    identities); ``save``/``load`` persist the index to one npz. A
    capacity-sized host buffer backs the updates. The device buffer is
    padded to a per-shard power of two and the jitted search takes the live
    row count as a traced scalar; while the capacity holds, ``add`` is an
    in-place donated ``dynamic_update_slice`` of just the new rows (blocks
    padded to powers of two → log-many compiles over any insert sequence),
    and only capacity growth or ``remove`` rebuilds/re-uploads."""

    def __init__(self, gallery_fvs: np.ndarray, gallery_pids=None, mesh=None,
                 quantize: str | None = None):
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        self.quantize = quantize
        self.mesh = mesh if mesh is not None else make_mesh()
        self.gallery_pids = None if gallery_pids is None else np.asarray(gallery_pids)
        self._search = self._build_search()
        self._commit(serving_embedding(gallery_fvs), normalized=False)

    @property
    def _host_gallery(self) -> np.ndarray:
        """View of the live rows of the capacity-sized host buffer."""
        return self._host_buf[: self.num_gallery]

    def _rep(self, x):
        """Replicate a host value over the mesh (multi-process-safe)."""
        return put_global(np.asarray(x), NamedSharding(self.mesh, P()))

    def _commit(self, g_rows: np.ndarray, normalized: bool = True) -> None:
        """Full rebuild + re-upload: init, ``remove``, and capacity growth.

        ``normalized=False`` L2-normalizes chunk-wise in place inside the
        capacity buffer — an out-of-place whole-matrix normalize would be a
        second input-sized f32 copy (32 GiB at the SQ8 capacity scale the
        chunked quantizer exists for)."""
        n_dev = self.mesh.devices.size
        n = g_rows.shape[0]
        self.num_gallery = n
        per_shard = -(-max(n, 1) // n_dev)
        per_shard = 1 << (per_shard - 1).bit_length()  # next power of two
        self._capacity = n_dev * per_shard
        buf = np.zeros((self._capacity, g_rows.shape[1]), np.float32)
        buf[:n] = g_rows
        if not normalized:
            for i in range(0, n, 1 << 16):
                blk = buf[i : min(i + (1 << 16), n)]
                blk /= np.linalg.norm(blk, axis=1, keepdims=True) + 1e-12
        self._host_buf = buf
        g_norm = buf[:n]
        if self.quantize == "int8":
            qbuf = np.zeros((self._capacity, g_rows.shape[1]), np.int8)
            sbuf = np.zeros(self._capacity, np.float32)
            qbuf[:n], sbuf[:n] = _quantize_rows(g_norm)
            # put_global: on a multi-process mesh (gallery larger than one
            # host's HBM) each process contributes its addressable shards
            self._gallery = put_global(qbuf, NamedSharding(self.mesh, P("data", None)))
            self._gallery_scale = put_global(sbuf, NamedSharding(self.mesh, P("data")))
            return
        self._gallery = put_global(buf, NamedSharding(self.mesh, P("data", None)))
        # zero-size scale placeholder keeping one jitted search signature —
        # built once per commit, not per search call (at multi-million-row
        # scale a per-call padded-size jnp.zeros is a 16 MB allocation)
        self._gallery_scale = put_global(
            np.zeros(self._capacity, np.float32), NamedSharding(self.mesh, P("data"))
        )

    def add(self, fvs: np.ndarray, pids=None) -> None:
        """Enroll additional gallery rows (raw embeddings; normalized here).

        While the new total fits the padded device capacity this is an
        in-place O(new rows) device update; otherwise the gallery rebuilds
        at the next power-of-two capacity."""
        f = serving_embedding(fvs)
        if (self.gallery_pids is None) != (pids is None):
            raise ValueError("pids must be provided iff the index tracks pids")
        if f.ndim != 2 or f.shape[1] != self._host_buf.shape[1]:
            raise ValueError(
                f"embedding shape {f.shape} does not match the index's "
                f"feature dim {self._host_buf.shape[1]}"
            )
        if pids is not None and len(np.asarray(pids)) != f.shape[0]:
            raise ValueError(f"{len(pids)} pids for {f.shape[0]} rows")
        f = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)
        n_new = f.shape[0]
        if n_new == 0:
            return
        off = self.num_gallery
        blk = 1 << (n_new - 1).bit_length()  # pow-2 block → log-many compiles
        if off + blk > self._capacity:
            self._commit(np.concatenate([self._host_gallery, f]))
        else:
            self._host_buf[off : off + n_new] = f
            self.num_gallery = off + n_new
            pad = blk - n_new
            if self.quantize == "int8":
                q, s = _quantize_rows(f)
                if pad:
                    q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.int8)])
                    s = np.concatenate([s, np.zeros(pad, np.float32)])
                self._gallery, self._gallery_scale = _append_rows_q8(
                    self._gallery, self._gallery_scale,
                    self._rep(q), self._rep(s), self._rep(np.int32(off))
                )
            else:
                blk_rows = (
                    np.concatenate([f, np.zeros((pad, f.shape[1]), np.float32)])
                    if pad else f
                )
                self._gallery = _append_rows(
                    self._gallery, self._rep(blk_rows), self._rep(np.int32(off))
                )
        # pids last: a failed add must leave the pid table consistent with
        # the rows actually enrolled (review finding)
        if pids is not None:
            self.gallery_pids = np.concatenate([self.gallery_pids, np.asarray(pids)])

    def remove(self, indices) -> None:
        """Retire gallery rows by index (as returned by ``search``)."""
        keep = np.ones(self.num_gallery, bool)
        keep[np.asarray(indices, dtype=np.intp)] = False
        if self.gallery_pids is not None:
            self.gallery_pids = self.gallery_pids[keep]
        self._commit(self._host_gallery[keep])

    def save(self, path: str) -> None:
        payload = {"gallery": self._host_gallery}
        if self.gallery_pids is not None:
            payload["pids"] = self.gallery_pids
        if self.quantize is not None:
            payload["quantize"] = np.str_(self.quantize)
        np.savez(path, **payload)

    @classmethod
    def load(cls, path: str, mesh=None, quantize: str | None = "auto") -> "GalleryIndex":
        """``quantize="auto"`` restores the saved index's mode; pass None /
        "int8" to override."""
        with np.load(path) as z:
            # 'embeddings' = the cli/search.py save format of earlier rounds
            g = z["gallery"] if "gallery" in z.files else z["embeddings"]
            pids = z["pids"] if "pids" in z.files else None
            if quantize == "auto":
                quantize = str(z["quantize"]) if "quantize" in z.files else None
            return cls(g, pids, mesh=mesh, quantize=quantize)

    def _build_search(self):
        mesh = self.mesh
        quantized = self.quantize == "int8"

        pallas_mode = _pallas_search_mode()

        def local_search(q, q_scale, g_local, g_scale, num_real, k):
            # q replicated (Q, D); g_local (G/n, D) this shard's rows
            shard_size = g_local.shape[0]
            shard_idx = jax.lax.axis_index("data")
            base = shard_idx * shard_size
            # a shard can hold fewer than k rows; the cross-shard merge
            # still sees n * k_local >= k candidates
            k_local = min(k, shard_size)

            from daliid_tpu.ops.search_topk import (
                CHUNK as _SCHUNK,
                F32_CHUNK as _FCHUNK,
                MAX_PROBES as _MAXQ,
            )

            chunk = _SCHUNK if quantized else _FCHUNK
            if (
                pallas_mode != "0"
                and shard_size >= _PALLAS_MIN_SHARD
                and shard_size % chunk == 0 and k_local <= 64
                and q.shape[0] <= _MAXQ
                # Q cap: the probe-tiled grid holds the whole (Q, k) carry
                # pair in VMEM (Q·k·8 bytes — 2 MB at Q=4096, k=64) while
                # each step's working set stays (q_tile, chunk); beyond
                # MAX_PROBES the XLA path amortizes its (Q, G) byproduct
                # anyway (BENCH.md).
            ):
                # fused kernel: chunk similarities stay in VMEM, HBM traffic
                # ≈ the gallery itself (ops/search_topk.py).
                from daliid_tpu.ops.search_topk import (
                    f32_search_topk,
                    sq8_search_topk,
                )

                nr_local = jnp.maximum(num_real - base, 0)
                interp = pallas_mode == "interpret"
                if quantized:
                    # the probe's per-row scale is rank-invariant → applied
                    # after the kernel
                    vals, idx = sq8_search_topk(
                        q, g_local, g_scale, nr_local, k_local,
                        chunk=chunk, interpret=interp,
                    )
                    vals = vals * q_scale[:, None]
                else:
                    vals, idx = f32_search_topk(
                        q, g_local, nr_local, k_local,
                        chunk=chunk, interpret=interp, g_scale=g_scale,
                    )
            else:
                if quantized:
                    # int8 x int8 → int32 (MXU double-rate), then the two
                    # per-row symmetric scales restore the cosine
                    acc = jax.lax.dot_general(
                        q, g_local, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    sims = acc.astype(jnp.float32) * q_scale[:, None] * g_scale[None, :]
                else:
                    sims = jnp.dot(q, g_local.T, preferred_element_type=jnp.float32)
                col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + base
                sims = jnp.where(col < num_real, sims, -jnp.inf)  # mask padding
                vals, idx = jax.lax.top_k(sims, k_local)
            global_idx = idx + base
            # gather every shard's candidates and merge
            all_vals = jax.lax.all_gather(vals, "data", axis=0)      # (n, Q, k)
            all_idx = jax.lax.all_gather(global_idx, "data", axis=0)
            all_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(vals.shape[0], -1)
            all_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(vals.shape[0], -1)
            mvals, mpos = jax.lax.top_k(all_vals, k)
            midx = jnp.take_along_axis(all_idx, mpos, axis=1)
            return mvals, midx

        @functools.partial(jax.jit, static_argnames=("k",))
        def search(q, q_scale, gallery, g_scale, num_real, k):
            fn = jax.shard_map(
                functools.partial(local_search, k=k),
                mesh=mesh,
                in_specs=(P(), P(), P("data", None), P("data"), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return fn(q, q_scale, gallery, g_scale, num_real)

        return search

    def search(self, probe_fvs: np.ndarray, k: int = 10, rerank: bool = False,
               rerank_depth: int = 64, rerank_k1: int = 20, rerank_k2: int = 6,
               rerank_lambda: float = 0.3):
        """→ (similarities (Q, k), gallery_indices (Q, k), pids (Q, k)).

        ``pids`` is None when the index does not track identities (built
        without ``gallery_pids``). ``probe_fvs`` are raw embeddings;
        normalized here. Similarity is the cosine (distance = 1 - sim,
        matching ``validateModels.py:47``).

        ``rerank=True`` re-orders each probe's top-``rerank_depth``
        shortlist with k-reciprocal re-ranking (``eval/rerank.py``, the
        eval-path algorithm batched per probe): candidate embeddings come
        from the exact f32 host copy, so the refinement is full-precision
        even on an SQ8 index. Returned scores are then ``1 - reranked
        distance`` (a Jaccard/cosine blend — ordering-faithful, not a raw
        cosine). With one probe and ``rerank_depth >= num_gallery`` this
        equals the batch-eval ``re_ranking`` exactly.
        """
        q = serving_embedding(probe_fvs)
        if q.ndim != 2 or q.shape[1] != self._host_buf.shape[1]:
            raise ValueError(
                f"probe shape {q.shape} does not match the index's "
                f"feature dim {self._host_buf.shape[1]}"
            )
        q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        k = min(k, self.num_gallery)
        k_fetch = k if not rerank else min(max(k, rerank_depth), self.num_gallery)
        q_f32 = q
        if self.quantize == "int8":
            q, q_scale = _quantize_rows(q)
        else:
            # zero-size probe placeholder keeps one jitted search signature
            # (the gallery-scale placeholder is cached by _commit)
            q_scale = np.zeros(q.shape[0], np.float32)
        # Pad tiny probe batches to 8 rows: below that XLA lowers the dot as
        # a VPU multiply-reduce at ~62% of HBM bandwidth, while the batched
        # MXU custom-call sweeps the gallery at peak (measured by
        # tools/profile_search.py — 1.5x on single-probe device time). The
        # zero rows cost one extra top_k lane and are sliced off below.
        n_probes = q.shape[0]
        if n_probes < 8:
            q = np.concatenate([q, np.zeros((8 - n_probes, q.shape[1]), q.dtype)])
            # pad scale = 1.0, not 0.0: pad probes are all-zero int8 rows so
            # their sims are 0/-inf regardless of scale, and a 0.0 scale
            # would turn the Pallas branch's -inf carry into -inf * 0 = NaN
            # (sliced off, but it trips jax_debug_nans — review finding)
            q_scale = np.concatenate([q_scale, np.ones(8 - n_probes, np.float32)])
        g_scale = self._gallery_scale
        # probes replicate over the mesh; put_global so a multi-process mesh
        # accepts them alongside the cross-process gallery
        vals, idx = self._search(
            self._rep(q), self._rep(q_scale), self._gallery, g_scale,
            self._rep(np.int32(self.num_gallery)), k_fetch
        )
        vals, idx = np.asarray(vals)[:n_probes], np.asarray(idx)[:n_probes]
        if rerank and self.num_gallery > 1:
            vals, idx = self._rerank_shortlist(
                q_f32, idx, k, rerank_k1, rerank_k2, rerank_lambda
            )
        else:
            vals, idx = vals[:, :k], idx[:, :k]
        pids = self.gallery_pids[idx] if self.gallery_pids is not None else None
        return vals, idx, pids

    def _rerank_shortlist(self, q_f32, idx, k, k1, k2, lam):
        """k-reciprocal re-rank of each probe's shortlist (rows from the
        exact f32 host copy; distances recomputed in f32)."""
        from daliid_tpu.eval.rerank import rerank_shortlists

        depth = idx.shape[1]
        cands = self._host_buf[idx]                      # (Q, depth, D) f32
        qg = 1.0 - np.einsum("qd,qjd->qj", q_f32, cands)
        gg = 1.0 - np.einsum("qid,qjd->qij", cands, cands)
        fulls = np.zeros((idx.shape[0], 1 + depth, 1 + depth), np.float32)
        fulls[:, 0, 1:] = qg
        fulls[:, 1:, 0] = qg
        fulls[:, 1:, 1:] = gg
        new_dist = np.asarray(
            rerank_shortlists(jnp.asarray(fulls), k1=min(k1, depth),
                              k2=min(k2, depth), lambda_value=float(lam))
        )
        order = np.argsort(new_dist, axis=1, kind="stable")[:, :k]
        return (
            1.0 - np.take_along_axis(new_dist, order, axis=1),
            np.take_along_axis(idx, order, axis=1),
        )
