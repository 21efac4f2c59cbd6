"""Profiling utilities and the text dataset loader."""

import time

import jax.numpy as jnp
import numpy as np

from daliid_tpu.data.registry import load_text_dataset
from daliid_tpu.utils import PhaseTimer, phase, profile_to, trace_annotation


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.span("extract"):
        time.sleep(0.02)
    with t.span("extract"):
        time.sleep(0.02)
    with t.span("train"):
        pass
    assert t.total("extract") >= 0.04
    assert t.mean("extract") >= 0.02
    assert "extract" in t.report() and "train" in t.report()


def test_phase_blocks_on_device_values():
    x = jnp.ones((128, 128))
    with phase("matmul", block_on=x) as elapsed:
        y = x @ x
    assert elapsed() >= 0.0


def test_trace_annotation_noop():
    with trace_annotation("span"):
        pass


def test_profile_to_writes_trace(tmp_path):
    with profile_to(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # jax profiler writes a plugins/profile dir
    assert any(tmp_path.rglob("*")), "no trace output written"


def test_load_text_dataset(tmp_path):
    for split, rows in (
        ("training", ["a1 100", "a2 101"]),
        ("query", ["a1 102"]),
        ("gallery", ["a2 103", "a1 104"]),
    ):
        (tmp_path / f"{split}_tweets.txt").write_text("\n".join(rows) + "\n")
    train, gallery, query = load_text_dataset("/base", list_dir=str(tmp_path))
    assert train.shape == (2, 3) and gallery.shape == (2, 3) and query.shape == (1, 3)
    assert train[0, 0] == "/base/a1/tweets.json"
    assert query[0, 2] == "102"
