"""Dataset registry: parsers producing (path, pid, camid, kind) tables.

Re-implements the reference's per-format loaders
(``Person-ReID/datasetUtils.py:6-102``) and its ``load_dataset`` registry
(``datasetUtils.py:106-248``) with two deliberate departures:

1. roots are configurable (the reference hard-codes absolute paths at
   ``datasetUtils.py:110-245``); set ``DALIID_DATA_ROOT`` or pass ``root=``,
2. tables are a typed :class:`ReidTable` (numpy-backed struct-of-arrays)
   rather than an object-dtype string matrix, so pids/camids are integer
   arrays usable directly as device buffers. ``ReidTable.as_legacy_array``
   reproduces the reference's ``[path, pid, camid, kind]`` ndarray rows
   (``datasetUtils.py:14-17``) for interop.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Sequence

import numpy as np
from tabulate import tabulate


@dataclasses.dataclass
class ReidTable:
    """A re-ID image table: one row per image.

    ``kind`` distinguishes 'person' vs 'object' instances (column 3 of the
    reference's arrays, ``datasetUtils.py:15,29``). ``camids`` follows each
    dataset's matching key — cameras for Market-style sets, tracklets for
    DeepChange (``datasetUtils.py:84,91``).
    """

    paths: np.ndarray      # (N,) object/str
    pids: np.ndarray       # (N,) int64
    camids: np.ndarray     # (N,) int64
    kinds: np.ndarray      # (N,) object/str, 'person' | 'object'
    name: str = ""

    def __post_init__(self):
        self.paths = np.asarray(self.paths, dtype=object)
        self.pids = np.asarray(self.pids, dtype=np.int64)
        self.camids = np.asarray(self.camids, dtype=np.int64)
        self.kinds = np.asarray(self.kinds, dtype=object)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx) -> "ReidTable":
        return ReidTable(self.paths[idx], self.pids[idx], self.camids[idx], self.kinds[idx], self.name)

    @property
    def num_ids(self) -> int:
        return len(np.unique(self.pids))

    @property
    def num_cams(self) -> int:
        return len(np.unique(self.camids))

    def concat(self, other: "ReidTable") -> "ReidTable":
        return ReidTable(
            np.concatenate([self.paths, other.paths]),
            np.concatenate([self.pids, other.pids]),
            np.concatenate([self.camids, other.camids]),
            np.concatenate([self.kinds, other.kinds]),
            self.name,
        )

    def relabeled(self, offset: int = 0) -> "ReidTable":
        """Densely renumber pids to 0..C-1 (+offset); used when merging
        datasets (mirrors the class renumbering at ``evaluate.py:131-174``)."""
        uniq, inv = np.unique(self.pids, return_inverse=True)
        return ReidTable(self.paths, inv + offset, self.camids, self.kinds, self.name)

    def as_legacy_array(self) -> np.ndarray:
        """Reference-compatible ``[path, pid, camid, kind]`` string matrix."""
        return np.stack(
            [
                self.paths.astype(str),
                self.pids.astype(str),
                self.camids.astype(str),
                self.kinds.astype(str),
            ],
            axis=1,
        )

    @staticmethod
    def from_rows(rows: Sequence[Sequence], name: str = "") -> "ReidTable":
        if len(rows) == 0:
            return ReidTable(np.array([]), np.array([]), np.array([]), np.array([]), name)
        paths, pids, camids, kinds = zip(*rows)
        return ReidTable(
            np.array(paths, dtype=object),
            np.array([int(p) for p in pids]),
            np.array([int(c) for c in camids]),
            np.array(kinds, dtype=object),
            name,
        )


# ---------------------------------------------------------------------------
# Per-format parsers (datasetUtils.py:6-102 equivalents)
# ---------------------------------------------------------------------------

def parse_market_duke_dir(directory: str, kind: str = "person") -> ReidTable:
    """Market-1501/Duke filename scheme ``<pid>_c<cam>...jpg``; junk pid -1
    rows are dropped (``datasetUtils.py:6-18``)."""
    rows = []
    for filename in sorted(os.listdir(directory)):
        if not filename.endswith(".jpg"):
            continue
        parts = filename.split("_")
        pid = int(parts[0])
        if pid == -1:
            continue
        camid = int(parts[1][1])
        rows.append((os.path.join(directory, filename), pid, camid, kind))
    return ReidTable.from_rows(rows)


def parse_veri_dir(directory: str) -> ReidTable:
    """VeRi filename scheme ``<pid>_c<cam>...jpg`` with multi-digit cam
    (``datasetUtils.py:20-33``); rows are 'object' instances."""
    rows = []
    for filename in sorted(os.listdir(directory)):
        if not filename.endswith(".jpg"):
            continue
        parts = filename.split("_")
        pid = int(parts[0])
        if pid == -1:
            continue
        camid = int(parts[1][1:])
        rows.append((os.path.join(directory, filename), pid, camid, "object"))
    return ReidTable.from_rows(rows)


def parse_veri_wild_list(list_path: str, image_root: str) -> ReidTable:
    """VeRi-Wild manifest: ``<pid>/<img> <refid> <camid>`` per line
    (``datasetUtils.py:35-51``)."""
    rows = []
    with open(list_path) as f:
        for line in f:
            if not line.strip():
                continue
            subpath, _refid, camid = line.split()
            pid = int(subpath.split("/")[0])
            rows.append((os.path.join(image_root, subpath), pid, int(camid), "object"))
    return ReidTable.from_rows(rows)


def parse_msmt17_list(list_path: str, image_root: str) -> ReidTable:
    """MSMT17 list file: ``<relpath> <pid>`` per line; camid parsed from the
    filename's third ``_`` field (``datasetUtils.py:53-67``)."""
    rows = []
    with open(list_path) as f:
        for line in f:
            if not line.strip():
                continue
            img_name, pid_name = line.split()
            camid = int(img_name.split("_")[2])
            rows.append((os.path.join(image_root, img_name), int(pid_name), camid, "person"))
    return ReidTable.from_rows(rows)


def parse_deepchange_list(base_dir: str, list_file: str, split_dir: str) -> ReidTable:
    """DeepChange bbox list: ``<img>,<tracklet>`` per line, filename scheme
    ``P<pid>_C<cam>_<day>_<hour>_..``. Matching key = tracklet id, as the
    reference ultimately returns (``datasetUtils.py:69-91``)."""
    rows = []
    with open(os.path.join(base_dir, list_file)) as f:
        for line in f:
            if not line.strip():
                continue
            img_name, tracklet_id = line.strip().split(",")
            pid = int(img_name.split("_")[0][1:])
            rows.append((os.path.join(base_dir, split_dir, img_name), pid, int(tracklet_id), "person"))
    return ReidTable.from_rows(rows)


def parse_manifest(list_path: str) -> ReidTable:
    """Generic manifest: ``<path> <pid> <camid> <kind>`` per line
    (``datasetUtils.py:93-102``)."""
    rows = []
    with open(list_path) as f:
        for line in f:
            if not line.strip():
                continue
            path, pid, camid, kind = line.split()
            rows.append((path, int(pid), int(camid), kind))
    return ReidTable.from_rows(rows)


# ---------------------------------------------------------------------------
# Registry (datasetUtils.py:106-248 equivalent, with configurable roots)
# ---------------------------------------------------------------------------

def data_root(root: str | None = None) -> str:
    return root or os.environ.get("DALIID_DATA_ROOT", "/data/reid")


def load_text_dataset(base_dir: str, list_dir: str = "."):
    """Author-identification text splits (``datasetUtils.load_text_dataset``,
    ``datasetUtils.py:250-280``): ``{training,query,gallery}_tweets.txt``
    manifests of ``<author_id> <tweet_id>`` lines → arrays of
    ``[tweets.json path, author_id, tweet_id]`` rows."""
    out = []
    for split in ("training", "query", "gallery"):
        rows = []
        with open(os.path.join(list_dir, f"{split}_tweets.txt")) as f:
            for line in f:
                if not line.strip():
                    continue
                author_id, tweet_id = line.split()
                rows.append([os.path.join(base_dir, author_id, "tweets.json"), author_id, tweet_id])
        out.append(np.array(rows, dtype=object))
    train, query, gallery = out
    return train, gallery, query


_LOADERS: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        _LOADERS[name] = fn
        return fn

    return deco


@register_dataset("Market")
def _load_market(root):
    base = os.path.join(root, "Market-1501-v15.09.15")
    return {
        "train": parse_market_duke_dir(os.path.join(base, "bounding_box_train")),
        "gallery": parse_market_duke_dir(os.path.join(base, "bounding_box_test")),
        "query": parse_market_duke_dir(os.path.join(base, "query")),
    }


@register_dataset("Duke")
def _load_duke(root):
    base = os.path.join(root, "DukeMTMC-reID")
    return {
        "train": parse_market_duke_dir(os.path.join(base, "bounding_box_train")),
        "gallery": parse_market_duke_dir(os.path.join(base, "bounding_box_test")),
        "query": parse_market_duke_dir(os.path.join(base, "query")),
    }


@register_dataset("MSMT17")
def _load_msmt17(root):
    base = os.path.join(root, "MSMT17_V2")
    train_root = os.path.join(base, "mask_train_v2")
    test_root = os.path.join(base, "mask_test_v2")
    return {
        "train": parse_msmt17_list(os.path.join(base, "list_train.txt"), train_root),
        "val": parse_msmt17_list(os.path.join(base, "list_val.txt"), train_root),
        "gallery": parse_msmt17_list(os.path.join(base, "list_gallery.txt"), test_root),
        "query": parse_msmt17_list(os.path.join(base, "list_query.txt"), test_root),
    }


@register_dataset("Veri")
def _load_veri(root):
    base = os.path.join(root, "VeRi")
    return {
        "train": parse_veri_dir(os.path.join(base, "image_train")),
        "gallery": parse_veri_dir(os.path.join(base, "image_test")),
        "query": parse_veri_dir(os.path.join(base, "image_query")),
    }


@register_dataset("Veri-Wild")
def _load_veri_wild(root):
    base = os.path.join(root, "VeRI-Wild")
    images = os.path.join(base, "images")
    split = os.path.join(base, "train_test_split")
    return {
        "train": parse_veri_wild_list(os.path.join(split, "train_list_start0.txt"), images),
        "gallery": parse_veri_wild_list(os.path.join(split, "test_10000_id.txt"), images),
        "query": parse_veri_wild_list(os.path.join(split, "test_10000_id_query.txt"), images),
    }


@register_dataset("DeepChange")
def _load_deepchange(root):
    base = os.path.join(root, "DeepChange")
    return {
        "train": parse_deepchange_list(base, "train-set-bbox.txt", "train-set"),
        "gallery": parse_deepchange_list(base, "test-set-gallery-bbox.txt", "test-set-gallery"),
        "query": parse_deepchange_list(base, "test-set-query-bbox.txt", "test-set-query"),
    }


@register_dataset("PRCC")
def _load_prcc(root):
    base = os.path.join(root, "prcc", "rgb")
    galleries = [parse_manifest(os.path.join(base, "test", f"gallery_{i}.txt")) for i in range(1, 11)]
    q_b = parse_manifest(os.path.join(base, "test", "query_B.txt"))
    q_c = parse_manifest(os.path.join(base, "test", "query_C.txt"))
    return {
        "train": parse_manifest(os.path.join(base, "train.txt")),
        "val": parse_manifest(os.path.join(base, "val.txt")),
        "gallery": galleries,
        "query": [q_b, q_c, q_b.concat(q_c)],
    }


@register_dataset("VC-Clothes")
def _load_vc_clothes(root):
    vc = os.path.join(root, "ClothesChanging", "VC-Clothes")
    real = os.path.join(root, "ClothesChanging", "Real28")
    return {
        "train": parse_manifest(os.path.join(vc, "train_file.txt")),
        "gallery": [
            parse_manifest(os.path.join(vc, "gallery_file.txt")),
            parse_manifest(os.path.join(real, "gallery_file.txt")),
        ],
        "query": [
            parse_manifest(os.path.join(vc, "query_file.txt")),
            parse_manifest(os.path.join(real, "query_file.txt")),
        ],
    }


@register_dataset("Celeb-ReID")
def _load_celeb(root):
    base = os.path.join(root, "Celeb-reID", "Celeb-reID")
    return {
        "train": parse_manifest(os.path.join(base, "train_file.txt")),
        "gallery": parse_manifest(os.path.join(base, "gallery_file.txt")),
        "query": parse_manifest(os.path.join(base, "query_file.txt")),
    }


@register_dataset("ImageNet")
def _load_imagenet(root):
    base = os.path.join(root, "ImageNet")
    return {
        "train": parse_manifest(os.path.join(base, "train_file.txt")),
        "val": parse_manifest(os.path.join(base, "val_file.txt")),
        "gallery": [parse_manifest(os.path.join(base, f"gallery_file{i}.txt")) for i in range(1, 11)],
        "query": [parse_manifest(os.path.join(base, f"query_file{i}.txt")) for i in range(1, 11)],
    }


@register_dataset("Synthetic")
def _load_synthetic(root):
    """Deterministic generated dataset (hermetic smoke runs / CI). Built on
    first use under ``<root>/Synthetic``; the turbulence dir is
    ``<root>/Synthetic/turbulence``.

    Generation holds an exclusive flock: two ranks of a (same-host)
    multi-process run racing here would otherwise let the loser parse a
    half-written directory as a 0-example dataset (multihost drill). Real
    cross-host runs must pre-generate the dataset on shared storage."""
    import fcntl

    from daliid_tpu.data.synthetic import make_synthetic_dataset

    base = os.path.join(root, "Synthetic")
    marker = os.path.join(base, "bounding_box_train")
    if not os.path.isdir(marker):
        # double-checked: only would-be generators touch the lock file, so
        # loading a pre-generated dataset from read-only storage stays a
        # pure read path
        os.makedirs(root, exist_ok=True)
        with open(base + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                if not os.path.isdir(marker):
                    make_synthetic_dataset(
                        base, num_ids=16, imgs_per_id_train=8, imgs_per_id_test=4
                    )
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
    return {
        "train": parse_market_duke_dir(os.path.join(base, "bounding_box_train")),
        "gallery": parse_market_duke_dir(os.path.join(base, "bounding_box_test")),
        "query": parse_market_duke_dir(os.path.join(base, "query")),
    }


def load_dataset(name: str, root: str | None = None) -> Dict[str, ReidTable]:
    """Load a registered dataset → dict with 'train'/'gallery'/'query'
    (+'val' where the format defines one). Mirrors
    ``datasetUtils.load_dataset`` (``datasetUtils.py:106-248``)."""
    if name not in _LOADERS:
        raise KeyError(f"unknown dataset {name!r}; registered: {sorted(_LOADERS)}")
    splits = _LOADERS[name](data_root(root))
    for k, v in splits.items():
        if isinstance(v, ReidTable):
            v.name = name
    return splits


def merge_train_tables(tables: Sequence[ReidTable]) -> ReidTable:
    """Concatenate training tables with densely renumbered, offset classes —
    the reference's multi-target class offsetting (``evaluate.py:131-174``)."""
    merged = None
    offset = 0
    for t in tables:
        r = t.relabeled(offset=offset)
        offset += r.num_ids
        merged = r if merged is None else merged.concat(r)
    return merged


def load_multiple_datasets(names: Sequence[str], root: str | None = None):
    """Per-target splits, training tables kept separate for the caller to
    merge (``datasetUtils.py:283-307``)."""
    return [load_dataset(n, root) for n in names]


def dataset_statistics(names: Sequence[str], root: str | None = None) -> str:
    """Tabulated per-split stats (``datasetUtils.py:309-366``)."""
    rows: List[list] = []
    all_splits = load_multiple_datasets(names, root)
    for name, splits in zip(names, all_splits):
        def stats(t):
            return [len(t), t.num_ids, t.num_cams]

        train_stats = stats(splits["train"])
        gallery = splits["gallery"]
        query = splits["query"]
        if isinstance(gallery, list) or isinstance(query, list):
            for gi, g in enumerate(gallery if isinstance(gallery, list) else [gallery]):
                rows.append([f"{name}:g{gi}"] + train_stats + stats(g) + ["-", "-", "-"])
            for qi, q in enumerate(query if isinstance(query, list) else [query]):
                rows.append([f"{name}:q{qi}"] + train_stats + ["-", "-", "-"] + stats(q))
        else:
            rows.append([name] + train_stats + stats(gallery) + stats(query))
    return tabulate(
        rows,
        headers=[
            "Dataset", "#Train", "#TrainIDs", "#TrainCams",
            "#Gallery", "#GalIDs", "#GalCams",
            "#Query", "#QIDs", "#QCams",
        ],
    )
