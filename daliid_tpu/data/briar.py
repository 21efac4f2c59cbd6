"""BRIAR-style npy-manifest ingest with probe filtering.

Re-implements the reference's BRIAR path (``Person-ReID/evaluate.py:77-128``):

- train/query/gallery manifests are ``.npy`` object arrays of rows
  ``[path, id_name, camid, distance_tag, ...]`` where identity names carry a
  one-character prefix that is stripped (``evaluate.py:82-89``);
- probes whose distance tag contains ``"range"`` (close-range capture) are
  dropped (``evaluate.py:91-101``);
- probe identities absent from the gallery are dropped
  (``evaluate.py:104-115``);
- train identities are densely renumbered (``evaluate.py:119-126``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from daliid_tpu.data.registry import ReidTable


def _strip_id_prefix(ids: np.ndarray) -> np.ndarray:
    return np.array([str(i)[1:] for i in ids])


def _to_table(rows: np.ndarray, kind: str = "person") -> ReidTable:
    ids = rows[:, 1]
    # ids may be non-numeric after prefix strip; map to dense ints
    uniq, inv = np.unique(ids, return_inverse=True)
    cams = rows[:, 2]
    cam_uniq, cam_inv = np.unique(cams, return_inverse=True)
    return ReidTable(
        paths=rows[:, 0],
        pids=inv.astype(np.int64),
        camids=cam_inv.astype(np.int64),
        kinds=np.array([kind] * len(rows), dtype=object),
        name="BRIAR",
    )


def _shared_dense_map(*label_columns: np.ndarray) -> dict:
    """One dense int mapping over the union of label columns.

    The reference passes raw id/camid STRINGS straight into
    ``torchreid.metrics.evaluate_rank`` (``evaluate.py:305-320``), so string
    equality across the query/gallery splits is what defines a same-id or
    same-camera pair.  Any dense renumbering must therefore be computed over
    the union of both splits — per-split ``np.unique`` would let identical
    indices denote different physical cameras whenever the splits' label
    sets differ (the normal BRIAR case: field probes vs controlled
    enrollment sensors)."""
    uniq = np.unique(np.concatenate([np.asarray(c, object) for c in label_columns]))
    return {v: i for i, v in enumerate(uniq)}


def load_briar_manifests(
    train_npy: str, queries_npy: str, gallery_npy: str
) -> Tuple[ReidTable, ReidTable, ReidTable]:
    """→ (train, query, gallery) tables with the reference's filtering."""
    train = np.load(train_npy, allow_pickle=True).astype(object)
    queries = np.load(queries_npy, allow_pickle=True).astype(object)
    gallery = np.load(gallery_npy, allow_pickle=True).astype(object)

    for arr in (train, queries, gallery):
        arr[:, 1] = _strip_id_prefix(arr[:, 1])

    # drop close-range probes (evaluate.py:91-101)
    keep = np.array(["range" not in str(tag) for tag in queries[:, 3]])
    queries = queries[keep]

    # drop probe-only identities (evaluate.py:104-115)
    probe_only = np.setdiff1d(queries[:, 1], gallery[:, 1])
    keep = ~np.isin(queries[:, 1], probe_only)
    queries = queries[keep]

    # the query/gallery id AND camid spaces must each share one dense mapping
    # across both splits (the reference compares raw strings across splits,
    # evaluate.py:305-320)
    id_map = _shared_dense_map(queries[:, 1], gallery[:, 1])
    cam_map = _shared_dense_map(queries[:, 2], gallery[:, 2])

    def table_with_shared_ids(rows):
        t = _to_table(rows)
        t.pids = np.array([id_map[i] for i in rows[:, 1]], np.int64)
        t.camids = np.array([cam_map[c] for c in rows[:, 2]], np.int64)
        return t

    train_t = _to_table(train)  # train ids densely renumbered independently
    return train_t, table_with_shared_ids(queries), table_with_shared_ids(gallery)


def load_eval_splits(
    dataset: str,
    root: str | None = None,
    train_npy: str | None = None,
    queries_npy: str | None = None,
    gallery_npy: str | None = None,
):
    """Single-dataset ingest for the eval CLIs: a registered dataset name,
    or ``"BRIAR"`` + the three manifest paths (the reference's ensemble and
    fusion CLIs take the same trio, ``evaluate_ensembled_models.py:77-128``,
    ``evaluateCleanATModels.py:60``; their BRIAR mode swaps ingest only —
    ranking stays the standard protocol, ``calculate_metrics``
    ``evaluate_ensembled_models.py:318-330``)."""
    from daliid_tpu.data.registry import load_dataset

    paths = (train_npy, queries_npy, gallery_npy)
    if any(paths) and not all(paths):
        raise SystemExit(
            "--train_file_path/--queries_file_path/--gallery_file_path "
            "must be given together (evaluate.py:77)"
        )
    if dataset == "BRIAR":
        if not all(paths):
            raise SystemExit(
                "the BRIAR dataset requires --train_file_path, "
                "--queries_file_path and --gallery_file_path "
                "(evaluate.py:77-128)"
            )
        train, query, gallery = load_briar_manifests(*paths)
        return {"train": train, "query": query, "gallery": gallery}
    if any(paths):
        raise SystemExit(
            "manifest paths are consumed by the BRIAR dataset only "
            "(evaluate.py:130-136)"
        )
    return load_dataset(dataset, root=root)
