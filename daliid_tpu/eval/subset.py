"""Similarity-based training-subset mining.

Re-implements ``get_subset`` / ``get_subset_one_encoder``
(``Person-ReID/getFeatures.py:243-353``): embed one selected sample with one
or more encoders, embed the whole train set, rank by (averaged) cosine
similarity, return the top-K closest rows. The reference streams batch-wise
similarities on the host; here it's one device matmul over pre-extracted
features.

Note on oracle testing: unlike the losses/trainer/validator, these two
reference functions cannot be run as a literal in-test oracle — they are
dead code upstream. Both reference bare ``transform_person`` /
``transform_vehicle`` names that are never defined at module scope in
``getFeatures.py`` (only ``sample.__init__`` builds a ``self.transform_person``,
``getFeatures.py:18``), so the first call raises ``NameError``; they also call
``sample(train_set)`` against the 6-argument ``sample.__init__``
(``getFeatures.py:12``). This module reconstructs the evident intent (the
similarity math at ``getFeatures.py:286-299,338-346`` is well-defined once
features exist) and is behavior-tested in
``tests/test_multihead_subset_briar.py``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from daliid_tpu.data.registry import ReidTable
from daliid_tpu.eval.features import FeatureExtractor


def _l2n(x):
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


def mine_subset(
    selected_row: ReidTable,
    train_table: ReidTable,
    extractors: Sequence[FeatureExtractor],
    top_k: int | None = None,
    perc_closest: float | None = None,
):
    """→ (selected_indexes, non_selected_indexes) into ``train_table``,
    ordered by descending mean similarity to the selected sample.

    One extractor ⇒ ``get_subset_one_encoder`` (``getFeatures.py:306-353``);
    several ⇒ the ensemble-averaged ``get_subset`` (``getFeatures.py:243-304``,
    which averages three encoders' similarity matrices at ``:285-289``).
    Pass either ``top_k`` or ``perc_closest`` (fraction of the train set).
    """
    if (top_k is None) == (perc_closest is None):
        raise ValueError("pass exactly one of top_k / perc_closest")
    sims = None
    for ex in extractors:
        sel = _l2n(np.atleast_2d(ex.extract(selected_row)))
        train = _l2n(ex.extract(train_table))
        s = (jnp.asarray(sel) @ jnp.asarray(train).T)[0]
        sims = s if sims is None else sims + s
    sims = np.asarray(sims) / len(extractors)

    order = np.argsort(-sims)
    k = top_k if top_k is not None else int(len(train_table) * perc_closest)
    return order[:k], order[k:]
