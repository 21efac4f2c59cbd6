"""Validators: query/gallery CMC+mAP, BRIAR argsort-CMC, MSMT17 balanced acc.

Mirrors ``Person-ReID/validateModels.py``:

- :class:`Validator` = ``validateModels.validate`` (``validateModels.py:35-76``):
  extract → L2-normalize → cosine distmat → Market-protocol CMC/mAP;
- :class:`BriarValidator` = ``validateBRIAR`` (``validateModels.py:84-105``):
  CMC with no camera filtering and every query counted, mAP reported as 0 —
  on device via the same counting kernel (the reference argsorts on host);
- :func:`get_validator` = ``validationManager.getValidator``
  (``validateModels.py:108-118``);
- :func:`msmt17_balanced_accuracy` = ``MSMT17_validator.validate_with_valSet``
  (``validateModels.py:155-196``): class centers from train features,
  top-1-center balanced accuracy on the val split.

Distance + ranking run on device; only the final scalars come back.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from daliid_tpu.data.registry import ReidTable
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.metrics.ranking import (
    cosine_distance_matrix,
    evaluate_rank_jax,
    evaluate_rank_sharded,
    evaluate_rank_sharded_multihead,
)


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


class Validator:
    """Standard Market-protocol validation.

    ``sharded``: route ranking through :func:`evaluate_rank_sharded` — each
    device ranks its query shard against the replicated gallery and CMC/AP
    merge with one ``psum``, so no full (Q, G) distance matrix ever
    materializes on one device (4.4 GB at DeepChange scale). ``None`` (the
    default) enables it automatically on a multi-device mesh whenever
    re-ranking is off; re-ranking inherently needs the full matrices.
    """

    # protocol knobs the BRIAR subclass overrides (consumed by rank /
    # rank_features so the sharded/replicated plumbing lives in ONE place)
    _count_all = False       # average over matched queries only (Market)
    _ignore_camera = False   # same-(pid, camid) junk filtering on
    _report_map = True       # BRIAR reports mAP as 0 (validateModels.py:105)

    def __init__(self, img_size=(256, 128), batch_size: int = 512, mesh=None, max_rank: int = 50,
                 rerank: bool = False, sharded: bool | None = None):
        self.img_size = img_size
        self.batch_size = batch_size
        self.mesh = mesh
        self.max_rank = max_rank
        self.rerank = rerank  # optional k-reciprocal re-ranking
                              # (the commented path at validateModels.py:49-53)
        self.sharded = sharded

    def _mesh(self):
        if self.mesh is None:
            from daliid_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()
        return self.mesh

    def _sharded_active(self) -> bool:
        if self.rerank:
            return False
        if self.sharded is None:
            return self._mesh().devices.size > 1
        return bool(self.sharded)

    def distance_matrix(self, query_fvs: np.ndarray, gallery_fvs: np.ndarray) -> jnp.ndarray:
        return cosine_distance_matrix(jnp.asarray(query_fvs), jnp.asarray(gallery_fvs))

    def reranked_distance_matrix(self, query_fvs, gallery_fvs, verbose: bool = False):
        """Distmat with the validator's optional k-reciprocal re-ranking
        applied (the commented path at ``validateModels.py:49-53``) — the
        one place the rerank switch acts, shared by ``validate`` and the
        eval CLI.

        Deliberate deviation from the cited reference lines: the qq/gg
        matrices here are cosine distances, consistent with the q-g matrix,
        while the reference's commented code mixed euclidean qq/gg into a
        cosine q-g. On L2-normalized features euclidean is a monotone (sqrt)
        transform of cosine, so the k-reciprocal NEIGHBOR SETS are identical;
        only re_ranking's exp(-d) blending weights differ. Consistent-cosine
        avoids mixing two metrics in one blend."""
        distmat = self.distance_matrix(query_fvs, gallery_fvs)
        if not self.rerank:
            return distmat
        from daliid_tpu.eval.rerank import re_ranking

        if verbose:
            print("Applying person re-ranking ...")
        return re_ranking(
            np.asarray(distmat),
            np.asarray(self.distance_matrix(query_fvs, query_fvs)),
            np.asarray(self.distance_matrix(gallery_fvs, gallery_fvs)),
        )

    def rank(self, distmat, queries: ReidTable, gallery: ReidTable):
        """→ (cmc curve of length max_rank — index with ``cmc[r-1]`` — ,
        mAP)."""
        cmc, mAP = evaluate_rank_jax(
            jnp.asarray(distmat),
            jnp.asarray(queries.pids.astype(np.int32)),
            jnp.asarray(gallery.pids.astype(np.int32)),
            jnp.asarray(queries.camids.astype(np.int32)),
            jnp.asarray(gallery.camids.astype(np.int32)),
            max_rank=self.max_rank,
            count_all=self._count_all,
            ignore_camera=self._ignore_camera,
        )
        return np.asarray(cmc), (float(mAP) if self._report_map else 0.0)

    def rank_features(self, q_fvs, g_fvs, queries: ReidTable, gallery: ReidTable,
                      head_weighting: str = "mean"):
        """CMC/mAP straight from raw embeddings. On the sharded path the
        distance rows live only on their query's device
        (:func:`evaluate_rank_sharded`, the SPMD replacement for
        ``Person-ReID/evaluate.py:291`` + rank_cy); otherwise the full
        distmat is built and ranked replicated.

        Multi-head extractions (tuple of embeddings) rank the per-head
        ensemble — ``head_weighting`` selects the reference's plain mean
        (``evaluate.py:279``) or per-pair magnitude weights (``:247-249``) —
        with NO full per-head (Q, G) distmat on the sharded path
        (:func:`evaluate_rank_sharded_multihead`)."""
        multi = isinstance(q_fvs, (tuple, list))
        if multi and self.rerank:
            raise ValueError(
                "re-ranking a multi-head ensemble is undefined upstream "
                "(evaluate.py never combines them); rerank per head instead"
            )
        pid_cam = (
            queries.pids.astype(np.int32), gallery.pids.astype(np.int32),
            queries.camids.astype(np.int32), gallery.camids.astype(np.int32),
        )
        if self._sharded_active():
            if multi:
                cmc, mAP = evaluate_rank_sharded_multihead(
                    q_fvs, g_fvs, *pid_cam,
                    mesh=self._mesh(), max_rank=self.max_rank,
                    count_all=self._count_all, ignore_camera=self._ignore_camera,
                    head_weighting=head_weighting,
                )
            else:
                cmc, mAP = evaluate_rank_sharded(
                    q_fvs, g_fvs, *pid_cam,
                    mesh=self._mesh(), max_rank=self.max_rank,
                    count_all=self._count_all, ignore_camera=self._ignore_camera,
                )
            return np.asarray(cmc), (float(mAP) if self._report_map else 0.0)
        if multi:
            return self.rank(
                self.multihead_distance_matrix(q_fvs, g_fvs, head_weighting),
                queries, gallery,
            )
        return self.rank(self.reranked_distance_matrix(q_fvs, g_fvs), queries, gallery)

    def multihead_distance_matrix(self, q_heads, g_heads, head_weighting: str = "mean",
                                  distmats=None):
        """Replicated ensemble distmat over head tuples — the reference's
        merge (``evaluate.py:239-279``) for small sets / single device.
        ``distmats`` takes precomputed per-head distmats (callers that also
        report per-head metrics avoid recomputing them)."""
        if distmats is None:
            distmats = [
                np.asarray(self.distance_matrix(qh, gh))
                for qh, gh in zip(q_heads, g_heads)
            ]
        if head_weighting == "magnitude":
            weights = [
                np.maximum(
                    np.linalg.norm(np.asarray(qh, np.float32), axis=1, keepdims=True),
                    np.linalg.norm(np.asarray(gh, np.float32), axis=1, keepdims=True).T,
                )
                for qh, gh in zip(q_heads, g_heads)
            ]
            return sum(w * d for w, d in zip(weights, distmats)) / sum(weights)
        return np.mean(distmats, axis=0)

    def validate(self, queries: ReidTable, gallery: ReidTable, bundle_or_extractor, verbose=True):
        """→ (cmc, mAP, distmat). Accepts a ModelBundle or a reusable
        FeatureExtractor (compile reuse across epochs). On the sharded path
        the full distmat is never materialized and ``None`` is returned in
        its place."""
        extractor = (
            bundle_or_extractor
            if isinstance(bundle_or_extractor, FeatureExtractor)
            else FeatureExtractor(
                bundle_or_extractor, img_size=self.img_size, batch_size=self.batch_size, mesh=self.mesh
            )
        )
        q_fvs = extractor.extract(queries, verbose=verbose)
        g_fvs = extractor.extract(gallery, verbose=verbose)
        multi = isinstance(q_fvs, (tuple, list))
        if self._sharded_active():
            # single- AND multi-head: rank_features keeps distance rows on
            # each query's device (multi-head: the per-pair head merge too)
            cmc, mAP = self.rank_features(q_fvs, g_fvs, queries, gallery)
            distmat = None
        elif multi:
            distmat = self.multihead_distance_matrix(q_fvs, g_fvs)
            cmc, mAP = self.rank(distmat, queries, gallery)
        else:
            distmat = self.reranked_distance_matrix(q_fvs, g_fvs, verbose=verbose)
            cmc, mAP = self.rank(distmat, queries, gallery)
            distmat = np.asarray(distmat)
        if verbose:
            print(f"** Results ** mAP: {mAP:.2%}")
            for r in (1, 5, 10):
                print(f"Rank-{r:<3}: {cmc[r - 1]:.2%}")
        return cmc, mAP, distmat


class BriarValidator(Validator):
    """BRIAR-style CMC: no junk filtering, every query counted, mAP 0
    (``validateModels.py:84-105``; the reference reports ranks 1/5/10/20 —
    read them at ``cmc[0]/cmc[4]/cmc[9]/cmc[19]`` of the returned curve).

    The reference argsorts the full distmat on host (O(Q·G log G)); here the
    same counting kernel as the Market protocol runs on device with the junk
    filter off and all-queries averaging (parity vs the host argsort in
    ``tests/test_eval.py``), sharded exactly like the base class — the
    protocol differences are the three class attributes.
    """

    _count_all = True
    _ignore_camera = True
    _report_map = False

    def __init__(self, img_size=(256, 128), batch_size: int = 512, mesh=None,
                 max_rank: int = 20, rerank: bool = False, sharded: bool | None = None):
        super().__init__(img_size=img_size, batch_size=batch_size, mesh=mesh,
                         max_rank=max_rank, rerank=rerank, sharded=sharded)


def get_validator(dataset_name: str, **kw) -> Validator:
    if dataset_name == "BRIAR":
        return BriarValidator(**kw)
    return Validator(**kw)


class MSMT17Validator:
    """Stateful best-balanced-accuracy tracker + checkpointing — the
    ``MSMT17_validator`` class (``validateModels.py:120-153``): validates
    both the online and momentum models on the val split each call and
    snapshots whichever first exceeds the best accuracy so far."""

    def __init__(self, train_table, val_table, img_size=(256, 128), batch_size=512, save_dir=None,
                 model_name="model", version="v0"):
        self.train_table = train_table
        self.val_table = val_table
        self.img_size = img_size
        self.batch_size = batch_size
        self.save_dir = save_dir
        self.model_name = model_name
        self.version = version
        self.best_accuracy = 0.0
        self.best_iter = 0

    def validate(self, pipeline_iter, online_extractor, momentum_extractor,
                 online_variables=None, momentum_variables=None, verbose=True):
        acc_online = msmt17_balanced_accuracy(
            self.train_table, self.val_table, online_extractor, verbose=verbose
        )
        acc_momentum = msmt17_balanced_accuracy(
            self.train_table, self.val_table, momentum_extractor, verbose=verbose
        )
        best = max(acc_online, acc_momentum)
        if best > self.best_accuracy:
            self.best_accuracy = best
            self.best_iter = pipeline_iter
            if self.save_dir and online_variables is not None:
                import os

                from daliid_tpu.train.checkpoint import save_variables

                os.makedirs(self.save_dir, exist_ok=True)
                save_variables(
                    os.path.join(self.save_dir, f"model_online_bestACC_{self.model_name}_{self.version}.npz"),
                    online_variables,
                )
                if momentum_variables is not None:
                    save_variables(
                        os.path.join(self.save_dir, f"model_momentum_bestACC_{self.model_name}_{self.version}.npz"),
                        momentum_variables,
                    )
        if verbose:
            print(f"Best Balanced Accuracy: {self.best_accuracy:.2%} and best iter: {self.best_iter}")
        return acc_online, acc_momentum


def msmt17_balanced_accuracy(
    train_table: ReidTable,
    val_table: ReidTable,
    bundle_or_extractor,
    img_size=(256, 128),
    batch_size: int = 512,
    mesh=None,
    verbose: bool = True,
) -> float:
    """Center-based balanced accuracy on a validation split
    (``validateModels.py:155-196``): per-class centers from train features,
    top-1 center prediction per val sample, mean per-class TPR."""
    extractor = (
        bundle_or_extractor
        if isinstance(bundle_or_extractor, FeatureExtractor)
        else FeatureExtractor(bundle_or_extractor, img_size=img_size, batch_size=batch_size, mesh=mesh)
    )
    train_fvs = _l2n(extractor.extract(train_table))
    val_fvs = _l2n(extractor.extract(val_table))

    labels = np.unique(train_table.pids)
    centers = np.stack([train_fvs[train_table.pids == l].mean(axis=0) for l in labels])
    centers = _l2n(centers)

    sims = val_fvs @ centers.T
    predicted = labels[np.argmax(sims, axis=1)]
    true_match = predicted == val_table.pids

    val_labels = np.unique(val_table.pids)
    tpr = [true_match[val_table.pids == l].mean() for l in val_labels]
    acc = float(np.mean(tpr))
    if verbose:
        print(f"Balanced Accuracy on Validation Set: {acc:.3%}")
    return acc
