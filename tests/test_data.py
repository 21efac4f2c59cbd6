"""Dataset registry, synthetic dataset, and turbulence path tests."""

import os

import numpy as np
import pytest

from daliid_tpu.data import (
    ReidTable,
    make_synthetic_dataset,
    parse_manifest,
    parse_market_duke_dir,
    turbulence_path,
)
from daliid_tpu.data.registry import dataset_statistics, load_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_dataset(str(root), num_ids=5, imgs_per_id_train=4, imgs_per_id_test=3)


def test_synthetic_dataset_shapes(synth):
    splits, turb_dir = synth
    assert len(splits["train"]) == 5 * 4
    assert len(splits["gallery"]) == 5 * 3
    assert splits["train"].num_ids == 5
    assert set(np.unique(splits["train"].kinds)) == {"person"}
    # every train image has 5 turbulence companions
    for p in splits["train"].paths:
        for s in range(1, 6):
            assert os.path.exists(turbulence_path(str(p), turb_dir, s))


def test_market_parser_drops_junk(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "0001_c1s1_000000.jpg").write_bytes(b"x")
    (d / "-1_c2s1_000001.jpg").write_bytes(b"x")
    (d / "0002_c3s1_000002.jpg").write_bytes(b"x")
    (d / "notes.txt").write_bytes(b"x")
    t = parse_market_duke_dir(str(d))
    assert len(t) == 2
    assert sorted(t.pids.tolist()) == [1, 2]
    assert sorted(t.camids.tolist()) == [1, 3]


def test_manifest_roundtrip(tmp_path):
    f = tmp_path / "list.txt"
    f.write_text("/a/x.jpg 3 1 person\n/a/y.jpg 4 2 object\n")
    t = parse_manifest(str(f))
    assert t.pids.tolist() == [3, 4]
    assert t.kinds.tolist() == ["person", "object"]


def test_turbulence_path_msmt_prefix():
    p = turbulence_path("/d/0001_010_05_0303morning_0015_1.jpg", "/turb", 3, dataset="MSMT17")
    assert p == "/turb/0001_0001_010_05_0303morning_0015_1_turbstrength3.jpg"
    p2 = turbulence_path("/d/0001_c1s1_0.jpg", "/turb", 5)
    assert p2 == "/turb/0001_c1s1_0_turbstrength5.jpg"


def test_relabel_and_legacy(synth):
    splits, _ = synth
    t = splits["train"].relabeled(offset=10)
    assert t.pids.min() == 10
    assert t.num_ids == splits["train"].num_ids
    legacy = splits["train"].as_legacy_array()
    assert legacy.shape == (len(splits["train"]), 4)
    assert legacy[0, 3] == "person"


def test_registry_with_root(synth, tmp_path):
    # Point the Market loader at a synthetic Market-shaped tree.
    root = tmp_path / "dataroot"
    market = root / "Market-1501-v15.09.15"
    market.mkdir(parents=True)
    make_synthetic_dataset(str(market), num_ids=3, imgs_per_id_train=2, imgs_per_id_test=2, with_turbulence=False)
    splits = load_dataset("Market", root=str(root))
    assert len(splits["train"]) == 6
    stats = dataset_statistics(["Market"], root=str(root))
    assert "Market" in stats


def test_merge_train_tables(synth):
    from daliid_tpu.data.registry import merge_train_tables

    splits, _ = synth
    a, b = splits["train"], splits["gallery"]
    merged = merge_train_tables([a, b])
    assert len(merged) == len(a) + len(b)
    # classes are disjoint across the two sources
    assert merged.num_ids == a.num_ids + b.num_ids
    assert merged.pids.min() == 0
    assert merged.pids.max() == merged.num_ids - 1


def test_unknown_dataset_raises():
    with pytest.raises(KeyError):
        load_dataset("NoSuchDataset")
