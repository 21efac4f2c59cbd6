"""Literal fusion/ensemble eval oracle: the reference's ASSEMBLED fusion and
ensemble CLIs, run literally under CPU torch, against our CLIs — sharing one
checkpoint file per model (VERDICT r3 item 1).

The composed-pipeline oracle covers trainer+validator; the meta-recognition
oracle covers libmr. This closes the last assembled surface — the DaliID
paper's headline fusion flow:

- ``Person-ReID/evaluateCleanATModels.py:33-246`` (``main``): clean+distorted
  ResNet-50 pair → concat / single / simple-average / magnitude-weighted
  fusion under gap, gmp, both pooling via the ``feature`` switch on its local
  ``ResNet50ReID`` (``:296-344``), ``getWeightsByMagnitude`` (``:249-256``),
  the pairwise max-weight blend (``:154-157``), and the ROC arrays
  (``:259-292``) — vs ``daliid_tpu/cli/evaluate_fusion.py``;
- ``Person-ReID/evaluate_ensembled_models.py:275-314``: two OSNet models →
  per-model cosine distmats + ``(d1+d2)/2`` ensemble via its local
  ``extractFeatures`` (``:354-401``) and ``calculate_metrics`` (``:317-332``)
  — vs ``daliid_tpu/cli/evaluate_ensemble.py``.

**Shared checkpoint protocol.** Each model is a literal reference wrapper
(``evaluateCleanATModels.ResNet50ReID`` / ``Encoders.OSNETReID``) with
randomized non-degenerate weights, saved with ``torch.save`` under the
``nn.DataParallel`` ``module.``-prefixed key scheme — exactly the
reference's checkpoint format (``mainKIT.py:169-170``). BOTH sides load the
same ``.pth`` file: the reference via its own ``load_state_dict`` lines
(``evaluateCleanATModels.py:85-86``), ours via the CLI's torch-checkpoint
path (``cli/evaluate.load_bundle`` → ``models/torch_port.py``). No weight
export from our side is involved, so the oracle also exercises the
user-facing torch-checkpoint ingestion end-to-end.

What is shared rather than literal (each documented upstream-dead or absent):

- torchvision is absent from this image → ``resnet50(pretrained=True)``
  (``evaluateCleanATModels.py:69``) is replaced by the torchvision-layout
  trunk mirror from the composed oracle; torchreid is absent →
  ``torchreid.models.build_model('osnet_x1_0')`` (``Encoders.py:131``) is
  replaced by the OSNet mirror from ``test_torch_port_zoo`` (both mirrors
  are key-scheme- and numerics-parity-tested there);
- ``evaluate_ensembled_models.py`` CANNOT import or run as shipped:
  ``from validateModels import validateOnDatasets`` (``:27``) names a
  function that does not exist upstream, ``from config import cfg`` (``:46``)
  names a file missing from the repo (SURVEY.md §2), and its
  ``getDCNN(..., is_clean_training=, stronger_levels_leave_early=)`` calls
  (``:199,228``) pass kwargs absent from ``Encoders.getDCNN`` (``:25``).
  The oracle injects a no-op ``validateOnDatasets``, a ``config`` stub, and
  a ``getDCNN`` shim reproducing the osnet branch (``Encoders.py:125-146``)
  over the mirror — everything else in ``main`` runs literally. osnet is
  used because ``Encoders.OSNETReID.forward`` (``:662``) is the only shipped
  wrapper whose signature binds the ensemble CLI's literal 4-arg call
  ``model(batch, None, eval_no_heads, eval_weighting)`` (``:285``);
- DataLoaders run with 0 workers (fork from the multithreaded JAX test
  process deadlocks); ``torchreid.metrics.evaluate_rank`` maps to our C++
  rank oracle (bit-parity vs rank_cy established in ``test_metrics``).

Runs on the 8-device virtual CPU mesh; marked slow.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/Person-ReID"
SEED = int(os.environ.get("DALIID_TEST_SEED", "12"))
IMG = (64, 32)  # images are emitted at target size, so eval Resize is a no-op
NUM_IDS = 10


# --------------------------------------------------------------------------
# shared scaffolding
# --------------------------------------------------------------------------


def _rows(table) -> np.ndarray:
    """Our ReidTable → the reference's object-array rows [path,pid,camid,kind]
    (datasetUtils.py:14-17), preserving row order exactly."""
    return np.array(
        [[str(p), str(int(pid)), str(int(cam)), "person"]
         for p, pid, cam in zip(table.paths, table.pids, table.camids)],
        dtype=object,
    )


def _randomize_seeded(torch_mod, model, seed: int):
    """Non-degenerate weights that keep activations alive through a deep
    trunk: convs/linears keep their (already random) default init; BN params
    and running stats are perturbed away from the 1/0 defaults so eval-mode
    BN semantics are actually exercised."""
    g = torch_mod.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if "running_var" in k:
            sd[k] = 0.5 + torch_mod.rand(v.shape, generator=g)
        elif "running_mean" in k:
            sd[k] = 0.1 * torch_mod.randn(v.shape, generator=g)
        elif (".bn" in k or "bn1" in k or "last_bn" in k or "downsample.1" in k) \
                and k.endswith((".weight", ".bias")) and v.ndim == 1:
            if k.endswith(".weight"):
                sd[k] = 0.75 + 0.5 * torch_mod.rand(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch_mod.randn(v.shape, generator=g)
        else:
            # re-draw conv/linear weights through the generator so the two
            # models differ by seed, at the default-init scale
            fan_in = max(1, int(np.prod(v.shape[1:])) if v.ndim > 1 else v.shape[0])
            sd[k] = torch_mod.randn(v.shape, generator=g) * (2.0 / fan_in) ** 0.5
    model.load_state_dict(sd)
    return model


class _RankRecorder:
    """Swap-in for the torchreid stub's evaluate_rank that records every
    (cmc, mAP) the literal calculateMetrics computes.

    Patches the *consumer module's own* ``torchreid`` binding — repeated
    ``_install_reference_stubs()`` calls rebuild the stub module in
    ``sys.modules``, so the object a previously-imported reference module
    holds can be older than the current global one."""

    def __init__(self, torchreid_mod):
        self.calls = []
        self._tr = torchreid_mod

    def install(self):
        self._orig = self._tr.metrics.evaluate_rank

        def wrapped(distmat, *a, **kw):
            cmc, mAP = self._orig(distmat, *a, **kw)
            self.calls.append((np.asarray(distmat, np.float64).copy(),
                               np.asarray(cmc).copy(), float(mAP)))
            return cmc, mAP

        self._tr.metrics.evaluate_rank = wrapped
        return self

    def uninstall(self):
        self._tr.metrics.evaluate_rank = self._orig


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    """Synthetic dataset (Market layout) + four shared checkpoints."""
    from tests.test_composed_pipeline_oracle import (
        _build_torch_resnet50_base,
        _install_reference_stubs,
    )
    from tests.test_torch_port_zoo import _build_torch_osnet

    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.data.registry import load_dataset

    root = tmp_path_factory.mktemp("fusion_oracle")
    market = root / "Market-1501-v15.09.15"
    market.mkdir()
    make_synthetic_dataset(
        str(market), num_ids=NUM_IDS, imgs_per_id_train=2, imgs_per_id_test=4,
        height=IMG[0], width=IMG[1], with_turbulence=False, seed=SEED,
    )
    splits = load_dataset("Market", root=str(root))

    _install_reference_stubs()
    import torch
    from torch import nn

    import Encoders
    import evaluateCleanATModels as ECAT

    ckpts = {}
    # clean/distortion pair: the fusion CLI's local wrapper over the trunk
    # mirror (evaluateCleanATModels.py:296-344), DataParallel-prefixed keys
    for tag, seed in (("clean", SEED * 10 + 1), ("at", SEED * 10 + 2)):
        m = nn.DataParallel(ECAT.ResNet50ReID(_build_torch_resnet50_base(torch)))
        _randomize_seeded(torch, m, seed)
        path = str(root / f"resnet50_{tag}.pth")
        torch.save(m.state_dict(), path)
        ckpts[tag] = path

    # osnet pair for the ensemble CLI: Encoders.OSNETReID over the mirror
    def _osnet_wrapper():
        mirror = _build_torch_osnet(torch)
        base = types.SimpleNamespace(
            conv1=mirror.conv1, maxpool=mirror.maxpool, conv2=mirror.conv2,
            conv3=mirror.conv3, conv4=mirror.conv4, conv5=mirror.conv5,
            global_avgpool=nn.AdaptiveAvgPool2d((1, 1)),
        )
        return Encoders.OSNETReID(base)

    for tag, seed in (("os1", SEED * 10 + 3), ("os2", SEED * 10 + 4)):
        m = nn.DataParallel(_osnet_wrapper())
        _randomize_seeded(torch, m, seed)
        path = str(root / f"osnet_{tag}.pth")
        torch.save(m.state_dict(), path)
        ckpts[tag] = path

    return dict(root=str(root), splits=splits, ckpts=ckpts,
                osnet_wrapper=_osnet_wrapper)


# --------------------------------------------------------------------------
# fusion: ours
# --------------------------------------------------------------------------


def _run_fusion_ours(shared, tmpdir):
    from daliid_tpu.cli import evaluate_fusion as fus_cli

    args = fus_cli.build_argparser().parse_args([
        "--dataset", "Market", "--data_root", shared["root"],
        "--model_name", "resnet50",
        "--model_path_clean", shared["ckpts"]["clean"],
        "--model_path_distortion", shared["ckpts"]["at"],
        "--img_height", str(IMG[0]), "--img_width", str(IMG[1]),
        "--batch_size", "32", "--compute_dtype", "float32",
        "--roc_version", "ours",
    ])

    recorded = {}
    raw = {}  # native-dtype copies (the ROC artifact check needs the exact
              # f32 values the CLI scored)
    orig_report = fus_cli._report

    def report_rec(tag, validator, distmat, queries, gallery, results):
        cmc, mAP = orig_report(tag, validator, distmat, queries, gallery, results)
        recorded[tag] = (np.asarray(distmat, np.float64).copy(),
                         np.asarray(cmc).copy(), float(mAP))
        raw[tag] = np.asarray(distmat).copy()
        return cmc, mAP

    cwd = os.getcwd()
    fus_cli._report = report_rec
    try:
        os.chdir(tmpdir)
        fus_cli.main(args)
    finally:
        fus_cli._report = orig_report
        os.chdir(cwd)

    roc = {n: np.load(os.path.join(tmpdir, f"{n}_ours.npy"))
           for n in ("FPR", "TPR", "Thresholds")}
    return recorded, roc, raw["magnitude_gap"]


# --------------------------------------------------------------------------
# fusion: literal reference main
# --------------------------------------------------------------------------


def _run_fusion_reference(shared, tmpdir):
    from tests.test_composed_pipeline_oracle import (
        _build_torch_resnet50_base,
        _install_reference_stubs,
    )

    _install_reference_stubs()
    import torch

    import evaluateCleanATModels as ECAT
    import getFeatures as GF

    splits = shared["splits"]
    q_rows, g_rows = _rows(splits["query"]), _rows(splits["gallery"])
    t_rows = _rows(splits["train"])

    real_loader = torch.utils.data.DataLoader

    def dl0(ds, batch_size=1, num_workers=0, pin_memory=False, **kw):
        return real_loader(ds, batch_size=batch_size, num_workers=0, **kw)

    rec = _RankRecorder(ECAT.torchreid).install()
    distmats = []
    distmats_raw = []  # native dtype — the ROC re-run must score the exact
                       # values main produced, not an upcast copy
    orig_cm = ECAT.calculateMetrics

    def cm_rec(queries_images, gallery_images, distmat, **kw):
        distmats.append(np.asarray(distmat, np.float64).copy())
        distmats_raw.append(np.asarray(distmat).copy())
        return orig_cm(queries_images, gallery_images, distmat, **kw)

    orig_ld = ECAT.load_dataset
    orig_r50 = ECAT.resnet50
    orig_gf_dl = GF.DataLoader
    orig_count = torch.cuda.device_count
    cwd = os.getcwd()
    try:
        # dataset ingest: identical rows, same order as our tables
        ECAT.load_dataset = lambda name: (t_rows, g_rows, q_rows)
        # torchvision absent: the trunk mirror stands in for
        # resnet50(pretrained=True) (evaluateCleanATModels.py:69)
        ECAT.resnet50 = lambda pretrained=True: _build_torch_resnet50_base(torch)
        GF.DataLoader = dl0
        # CPU-only torch reports 0 GPUs; main indexes gpu_indexes[0]
        torch.cuda.device_count = lambda: 1
        ECAT.calculateMetrics = cm_rec
        os.chdir(tmpdir)
        ECAT.main(
            "0", IMG[0], IMG[1], "resnet50",
            shared["ckpts"]["clean"], shared["ckpts"]["at"],
            "Market", "oracle",
        )
        assert len(distmats) == 7  # concat, clean, dist, avg, gap, gmp, both
        # ROC arrays: dead in the shipped main (the pooling= call at :159 is
        # commented out) but live capability — run calculateMetrics with
        # pooling/version on the GAP-fused distmat (:276-292)
        ECAT.calculateMetrics(q_rows, g_rows, distmats_raw[4],
                              pooling="GAP", version="ref")
        roc = {n: np.load(os.path.join(tmpdir, f"{n}_ref.npy"))
               for n in ("FPR", "TPR", "Thresholds")}
    finally:
        ECAT.load_dataset = orig_ld
        ECAT.resnet50 = orig_r50
        ECAT.calculateMetrics = orig_cm
        GF.DataLoader = orig_gf_dl
        torch.cuda.device_count = orig_count
        rec.uninstall()
        os.chdir(cwd)

    order = ("concat", "clean", "distortion", "average",
             "magnitude_gap", "magnitude_gmp", "magnitude_both")
    # rec.calls has 8 entries (7 from main + 1 ROC re-run); pair the first 7
    out = {tag: (distmats[i], rec.calls[i][1], rec.calls[i][2])
           for i, tag in enumerate(order)}
    return out, roc, distmats_raw[4]


# --------------------------------------------------------------------------
# ensemble: ours + literal reference main
# --------------------------------------------------------------------------


def _run_ensemble_ours(shared):
    from daliid_tpu.cli import evaluate_ensemble as ens_cli

    args = ens_cli.build_argparser().parse_args([
        "--dataset", "Market", "--data_root", shared["root"],
        "--model_name01", "osnet", "--model_name02", "osnet",
        "--model_path01", shared["ckpts"]["os1"],
        "--model_path02", shared["ckpts"]["os2"],
        "--img_height", str(IMG[0]), "--img_width", str(IMG[1]),
        "--batch_size", "32", "--compute_dtype", "float32",
    ])

    recorded = []
    orig_get_val = ens_cli.get_validator

    def get_val_rec(*a, **kw):
        validator = orig_get_val(*a, **kw)
        orig_rank = validator.rank

        def rank_rec(distmat, queries, gallery, **kw2):
            cmc, mAP = orig_rank(distmat, queries, gallery, **kw2)
            recorded.append((np.asarray(distmat, np.float64).copy(),
                             np.asarray(cmc).copy(), float(mAP)))
            return cmc, mAP

        validator.rank = rank_rec
        return validator

    ens_cli.get_validator = get_val_rec
    try:
        ens_cli.main(args)
    finally:
        ens_cli.get_validator = orig_get_val
    assert len(recorded) == 3  # model01, model02, ensemble
    return dict(zip(("model01", "model02", "ensemble"), recorded))


def _run_ensemble_reference(shared):
    from tests.test_composed_pipeline_oracle import _install_reference_stubs

    _install_reference_stubs()
    import torch
    from torch import nn

    # the stale upstream imports (see module docstring): inject before import
    import validateModels

    for stale in ("validateOnDatasets", "validate_with_valSet"):
        if not hasattr(validateModels, stale):
            setattr(validateModels, stale, lambda *a, **k: None)
    if "config" not in sys.modules:
        cfg_mod = types.ModuleType("config")
        cfg_mod.cfg = types.SimpleNamespace(
            merge_from_file=lambda *a: None, merge_from_list=lambda *a: None,
            freeze=lambda: None,
        )
        sys.modules["config"] = cfg_mod

    import evaluate_ensembled_models as EEM

    splits = shared["splits"]
    q_rows, g_rows = _rows(splits["query"]), _rows(splits["gallery"])
    t_rows = _rows(splits["train"])

    real_loader = torch.utils.data.DataLoader

    def dl0(ds, batch_size=1, num_workers=0, pin_memory=False, **kw):
        return real_loader(ds, batch_size=batch_size, num_workers=0, **kw)

    def getdcnn_shim(gpu_indexes, model_name, **stale_kwargs):
        # Encoders.getDCNN rejects the is_clean_training /
        # stronger_levels_leave_early kwargs the CLI passes (:199,228 vs
        # Encoders.py:25); this shim reproduces the osnet branch
        # (Encoders.py:125-146) over the mirror. Weights are overwritten by
        # the literal load_state_dict right after (:202).
        assert model_name == "osnet"
        model = nn.DataParallel(shared["osnet_wrapper"](), device_ids=gpu_indexes)
        return model, None

    rec = _RankRecorder(EEM.torchreid).install()
    distmats = []
    orig_cm = EEM.calculate_metrics

    def cm_rec(distmat, queries, gallery):
        distmats.append(np.asarray(distmat, np.float64).copy())
        return orig_cm(distmat, queries, gallery)

    orig_gd = EEM.getDCNN
    orig_stats = EEM.get_dataset_samples_and_statistics
    orig_dl = EEM.DataLoader
    orig_count = torch.cuda.device_count
    try:
        EEM.getDCNN = getdcnn_shim
        EEM.get_dataset_samples_and_statistics = lambda names: (t_rows, g_rows, q_rows)
        EEM.DataLoader = dl0
        EEM.calculate_metrics = cm_rec
        torch.cuda.device_count = lambda: 1
        EEM.main(
            "0", IMG[0], IMG[1],
            "osnet", shared["ckpts"]["os1"],
            "osnet", shared["ckpts"]["os2"],
            stronger_levels_leave_early=False,
            eval_no_heads=False, eval_weighting=False, multiple_output=False,
            targets="Synthetic",
            train_file_path=None, queries_file_path=None, gallery_file_path=None,
            turbulance_dir_path=None, cfg=sys.modules["config"].cfg,
        )
    finally:
        EEM.getDCNN = orig_gd
        EEM.get_dataset_samples_and_statistics = orig_stats
        EEM.DataLoader = orig_dl
        EEM.calculate_metrics = orig_cm
        torch.cuda.device_count = orig_count
        rec.uninstall()

    assert len(distmats) == 3
    return {tag: (distmats[i], rec.calls[i][1], rec.calls[i][2])
            for i, tag in enumerate(("model01", "model02", "ensemble"))}


# --------------------------------------------------------------------------
# fixtures running each side once
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fusion(shared, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("fusion_roc"))
    ours, roc_ours, gap_raw_ours = _run_fusion_ours(shared, tmp)
    theirs, roc_ref, gap_raw_ref = _run_fusion_reference(shared, tmp)
    return ours, theirs, roc_ours, roc_ref, gap_raw_ours, gap_raw_ref


@pytest.fixture(scope="module")
def ensemble(shared):
    ours = _run_ensemble_ours(shared)
    theirs = _run_ensemble_reference(shared)
    return ours, theirs


# --------------------------------------------------------------------------
# assertions
# --------------------------------------------------------------------------

FUSION_TAGS = ("concat", "clean", "distortion", "average",
               "magnitude_gap", "magnitude_gmp", "magnitude_both")


def _assert_variant(tag, mine, ref, dist_atol):
    d_mine, cmc_mine, map_mine = mine
    d_ref, cmc_ref, map_ref = ref
    assert d_mine.shape == d_ref.shape
    diff = float(np.abs(d_mine - d_ref).max())
    # robustness guard: the metric comparison below is only meaningful if
    # cross-framework forward noise cannot flip a rank — require the
    # smallest nonzero per-query distance gap to dominate the distmat diff
    gaps = np.diff(np.sort(d_ref, axis=1), axis=1)
    min_gap = float(gaps[gaps > 1e-9].min())
    print(f"[fusion-oracle] {tag}: max|Δdist|={diff:.2e} min_gap={min_gap:.2e}")
    assert diff <= dist_atol, f"{tag}: distmat diff {diff:.2e} > {dist_atol:.0e}"
    np.testing.assert_allclose(cmc_mine[:20], cmc_ref[:20], atol=1e-6,
                               err_msg=f"{tag} CMC")
    assert map_mine == pytest.approx(map_ref, abs=1e-4), f"{tag} mAP"


@pytest.mark.slow
def test_fusion_all_variants_match(fusion):
    """All 7 variants the literal evaluateCleanATModels.main evaluates:
    fused distmats + CMC/mAP."""
    ours, theirs = fusion[0], fusion[1]
    assert set(ours) == set(FUSION_TAGS) and set(theirs) == set(FUSION_TAGS)
    for tag in FUSION_TAGS:
        _assert_variant(tag, ours[tag], theirs[tag], dist_atol=5e-3)


def _roc_inputs(shared, distmat_raw):
    """The exact (labels, scores) each side feeds sklearn
    (evaluateCleanATModels.py:281-287): label = same pid, score = 1 - d/2,
    computed at the distmat's NATIVE dtype — the rounding of ``1 - d/2``
    merges/preserves near-ties differently per precision, which changes
    sklearn's retained corner set (measured: the same distmat yields ~50
    thresholds scored in f32 vs ~12 in f64). Callers pass the raw
    native-dtype copy captured from the run, so this reproduces the saved
    artifact bit-for-bit."""
    splits = shared["splits"]
    q_pids = np.asarray(splits["query"].pids).reshape(-1, 1)
    g_pids = np.asarray(splits["gallery"].pids).reshape(1, -1)
    scores = (1.0 - distmat_raw / 2.0).ravel()
    assert scores.dtype == distmat_raw.dtype
    return (q_pids == g_pids).astype(np.int32).ravel(), scores


def _step_tpr(fpr, tpr, grid):
    """TPR of the ROC step function at each grid FPR (right-continuous)."""
    idx = np.searchsorted(fpr, grid, side="right") - 1
    return tpr[np.clip(idx, 0, len(tpr) - 1)]


@pytest.mark.slow
def test_fusion_roc_arrays_match(fusion, shared):
    """ROC over the GAP-fused distmat (evaluateCleanATModels.py:276-292).

    The raw threshold arrays are NOT comparable across frameworks: sklearn's
    ``drop_intermediate`` keeps one threshold per ROC corner, and corners
    depend on exact score TIES — the synthetic set has near-duplicate
    gallery rows whose distances tie under torch f64 scoring but differ by
    O(1e-3) forward noise (and f32 rounding) under JAX, so the retained
    threshold sets differ (measured 54 vs 12) while the curves coincide.
    The honest parity is:

    1. each side's saved artifact is exactly ``sklearn.roc_curve`` of its
       own GAP-fused distmat (native dtype) under the reference's
       label/score construction (the plumbing from :281-287 through
       ``np.save``), and
    2. the two ROC step functions coincide as FUNCTIONS (pointwise on a
       common FPR grid) and in area (AUC).
    """
    from sklearn.metrics import auc, roc_curve

    _, _, roc_ours, roc_ref, gap_raw_ours, gap_raw_ref = fusion
    for side, roc, raw in (("ours", roc_ours, gap_raw_ours),
                           ("ref", roc_ref, gap_raw_ref)):
        labels, scores = _roc_inputs(shared, raw)
        fpr, tpr, thr = roc_curve(labels, scores, pos_label=1)
        np.testing.assert_allclose(roc["FPR"], fpr, atol=1e-12,
                                   err_msg=f"{side} FPR artifact")
        np.testing.assert_allclose(roc["TPR"], tpr, atol=1e-12,
                                   err_msg=f"{side} TPR artifact")
        np.testing.assert_allclose(roc["Thresholds"], thr, atol=1e-12,
                                   err_msg=f"{side} thresholds artifact")

    auc_ours = auc(roc_ours["FPR"], roc_ours["TPR"])
    auc_ref = auc(roc_ref["FPR"], roc_ref["TPR"])
    assert auc_ours == pytest.approx(auc_ref, abs=1e-3), "ROC AUC"
    grid = np.linspace(0.0, 1.0, 401)
    t_ours = _step_tpr(roc_ours["FPR"], roc_ours["TPR"], grid)
    t_ref = _step_tpr(roc_ref["FPR"], roc_ref["TPR"], grid)
    # pointwise agreement except within one tie-group of the corner noise:
    # allow a TPR step of one positive pair at isolated grid points
    n_pos = int(_roc_inputs(shared, gap_raw_ref)[0].sum())
    mism = np.abs(t_ours - t_ref) > (1.5 / n_pos)
    assert mism.mean() < 0.02, \
        f"ROC step functions diverge at {mism.mean():.1%} of the FPR grid"


@pytest.mark.slow
def test_ensemble_all_variants_match(ensemble):
    """Per-model + averaged-ensemble distmats and CMC/mAP from the literal
    evaluate_ensembled_models.main (:275-314)."""
    ours, theirs = ensemble
    for tag in ("model01", "model02", "ensemble"):
        _assert_variant(tag, ours[tag], theirs[tag], dist_atol=5e-3)
