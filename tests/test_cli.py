"""CLI entry points driven programmatically on the virtual mesh."""

import argparse
import os
import sys
import time

import numpy as np
import pytest

from daliid_tpu.cli import evaluate as eval_cli
from daliid_tpu.cli import evaluate_ensemble as ens_cli
from daliid_tpu.cli import evaluate_fusion as fus_cli
from daliid_tpu.data import make_synthetic_dataset
from daliid_tpu.data.registry import register_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliroot")
    market = root / "Market-1501-v15.09.15"
    market.mkdir()
    make_synthetic_dataset(
        str(market), num_ids=4, imgs_per_id_train=3, imgs_per_id_test=2,
        height=32, width=16, with_turbulence=False,
    )
    return str(root)


def _eval_args(data_root, **over):
    base = dict(
        targets=["Market"], data_root=data_root, model_name="deit_small",
        model_path=None, img_height=32, img_width=16, batch_size=16,
        compute_dtype="float32", turbulence_dir_path=None, turbulence_strength=None,
        multiple_output=False, mrfuse=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_evaluate_cli_single(data_root):
    results = eval_cli.main(_eval_args(data_root))
    cmc, mAP = results["Market"]
    assert 0.0 <= mAP <= 1.0 and 0.0 <= cmc[0] <= 1.0


def test_evaluate_cli_multisplit(data_root):
    # register a synthetic multi-split protocol (PRCC-shaped)
    @register_dataset("FakePRCC")
    def _fake_prcc(root):
        from daliid_tpu.data.registry import parse_market_duke_dir

        base = os.path.join(root, "Market-1501-v15.09.15")
        g = parse_market_duke_dir(os.path.join(base, "bounding_box_test"))
        q = parse_market_duke_dir(os.path.join(base, "query"))
        t = parse_market_duke_dir(os.path.join(base, "bounding_box_train"))
        half = len(g) // 2
        return {"train": t, "gallery": [g[np.arange(half)], g[np.arange(half, len(g))]],
                "query": [q]}

    results = eval_cli.main(_eval_args(data_root, targets=["FakePRCC"]))
    r1, mAP = results["FakePRCC:q0"]
    assert 0.0 <= mAP <= 1.0


def test_ensemble_cli(data_root):
    args = argparse.Namespace(
        dataset="Market", data_root=data_root, model_name01="deit_small",
        model_name02="deit_small", model_path01=None, model_path02=None,
        img_height=32, img_width=16, batch_size=16, compute_dtype="float32",
    )
    results = ens_cli.main(args)
    assert {"model01", "model02", "ensemble"} <= set(results)


def test_ensemble_cli_int8(data_root):
    """--quantize int8 is wired through the ensemble CLI (each model
    calibrates lazily on its first batch); same for the fusion CLI's parser."""
    argv = ["--dataset", "Market", "--data_root", data_root,
            "--model_name01", "deit_small", "--model_name02", "deit_small",
            "--img_height", "32", "--img_width", "16", "--batch_size", "16",
            "--compute_dtype", "float32", "--quantize", "int8"]
    args = ens_cli.build_argparser().parse_args(argv)
    results = ens_cli.main(args)
    assert {"model01", "model02", "ensemble"} <= set(results)
    assert 0.0 <= results["ensemble"]["mAP"] <= 1.0
    assert fus_cli.build_argparser().parse_args(
        ["--dataset", "Market", "--quantize", "int8"]).quantize == "int8"


def test_fusion_cli(data_root):
    args = argparse.Namespace(
        dataset="Market", data_root=data_root, model_name="resnet50",
        model_path_clean=None, model_path_distortion=None,
        img_height=32, img_width=16, batch_size=16, compute_dtype="float32",
        roc_version=None,
    )
    results = fus_cli.main(args)
    assert {"concat", "clean", "distortion", "average",
            "magnitude_gap", "magnitude_gmp", "magnitude_both"} <= set(results)


@pytest.fixture(scope="module")
def briar_manifests(data_root, tmp_path_factory):
    """npy manifests over the synthetic market images, with a close-range
    probe and a probe-only identity that data/briar.py must filter."""
    from daliid_tpu.data.registry import parse_market_duke_dir

    tmp = tmp_path_factory.mktemp("briar_manifests")
    base = os.path.join(data_root, "Market-1501-v15.09.15")
    g = parse_market_duke_dir(os.path.join(base, "bounding_box_test"))
    q = parse_market_duke_dir(os.path.join(base, "query"))
    t = parse_market_duke_dir(os.path.join(base, "bounding_box_train"))

    def manifest(table, name, extra_rows=()):
        rows = [[p, f"G{pid}", f"c{cam}", "200m"]
                for p, pid, cam in zip(table.paths, table.pids, table.camids)]
        rows.extend(extra_rows)
        path = tmp / f"{name}.npy"
        np.save(path, np.array(rows, dtype=object), allow_pickle=True)
        return str(path)

    extra = [[str(q.paths[0]), "G7777", "c1", "200m"],
             [str(q.paths[0]), f"G{q.pids[0]}", "c1", "close_range"]]
    return {
        "train": manifest(t, "train"),
        "q": manifest(q, "queries", extra_rows=extra),
        "g": manifest(g, "gallery"),
    }


def test_evaluate_cli_briar_manifests(data_root, briar_manifests):
    """`--targets BRIAR` + the three manifest flags run the reference's
    npy-ingest flow (evaluate.py:77-128,643-645) end to end, and the
    guards fail loudly on partial/misplaced manifest flags."""
    paths = briar_manifests
    argv = ["--targets", "BRIAR", "--model_name", "deit_small",
            "--img_height", "32", "--img_width", "16", "--batch_size", "16",
            "--compute_dtype", "float32",
            "--train_file_path", paths["train"],
            "--queries_file_path", paths["q"],
            "--gallery_file_path", paths["g"]]
    results = eval_cli.main(eval_cli.build_argparser().parse_args(argv))
    cmc, mAP = results["BRIAR"]
    assert 0.0 <= cmc[0] <= 1.0
    # the manifest eval ranks with the STANDARD protocol (the reference's
    # calculate_metrics is plain evaluate_rank, evaluate.py:318-330), so a
    # real mAP is reported — NOT validateBRIAR's mAP-as-0 (training-time)
    assert 0.0 < mAP <= 1.0

    p = eval_cli.build_argparser()
    with pytest.raises(SystemExit, match="given together"):
        eval_cli.main(p.parse_args(
            ["--targets", "BRIAR", "--train_file_path", paths["train"]]))
    with pytest.raises(SystemExit, match="BRIAR"):
        eval_cli.main(p.parse_args(
            ["--targets", "Market", "--data_root", data_root,
             "--train_file_path", paths["train"],
             "--queries_file_path", paths["q"],
             "--gallery_file_path", paths["g"]]))
    with pytest.raises(SystemExit, match="requires"):
        eval_cli.main(p.parse_args(["--targets", "BRIAR"]))


def test_ensemble_and_fusion_cli_briar_manifests(briar_manifests):
    """The reference's ensemble and fusion CLIs take the same manifest trio
    (evaluate_ensembled_models.py:77-128, evaluateCleanATModels.py:60);
    their BRIAR mode swaps ingest only — ranking stays the standard
    protocol (calculate_metrics)."""
    paths = briar_manifests
    trio = ["--train_file_path", paths["train"],
            "--queries_file_path", paths["q"],
            "--gallery_file_path", paths["g"]]
    shape = ["--img_height", "32", "--img_width", "16", "--batch_size", "16",
             "--compute_dtype", "float32"]

    argv = (["--dataset", "BRIAR", "--model_name01", "deit_small",
             "--model_name02", "deit_small"] + shape + trio)
    results = ens_cli.main(ens_cli.build_argparser().parse_args(argv))
    assert {"model01", "model02", "ensemble"} <= set(results)
    assert 0.0 < results["ensemble"]["mAP"] <= 1.0

    argv = (["--dataset", "BRIAR", "--model_name", "resnet50"] + shape + trio)
    results = fus_cli.main(fus_cli.build_argparser().parse_args(argv))
    assert {"concat", "average", "magnitude_gap"} <= set(results)
    assert 0.0 < results["concat"]["mAP"] <= 1.0

    from daliid_tpu.data.briar import load_eval_splits

    with pytest.raises(SystemExit, match="given together"):
        load_eval_splits("BRIAR", train_npy=paths["train"])
    with pytest.raises(SystemExit, match="requires"):
        load_eval_splits("BRIAR")
    with pytest.raises(SystemExit, match="BRIAR dataset only"):
        load_eval_splits("Market", train_npy=paths["train"],
                         queries_npy=paths["q"], gallery_npy=paths["g"])


def test_evaluate_cli_rejects_sie_coef_without_sie(data_root):
    """A non-default --sie_coef with SIE disabled must fail loudly instead
    of being silently unused (review fix); same guard in the train CLI."""
    with pytest.raises(SystemExit, match="sie_coef"):
        eval_cli.main(_eval_args(data_root, sie_coef=3.0))


def test_evaluate_cli_sharded_eval_tristate():
    """--sharded_eval / --no-sharded_eval / absent → True / False / None
    (None = automatic on a multi-device mesh); False must force the
    replicated full-distmat path even on a mesh."""
    base = ["--targets", "Market"]
    p = eval_cli.build_argparser()
    assert p.parse_args(base).sharded_eval is None
    assert p.parse_args(base + ["--sharded_eval"]).sharded_eval is True
    assert p.parse_args(base + ["--no-sharded_eval"]).sharded_eval is False

    from daliid_tpu.eval.validate import Validator

    assert Validator(sharded=False)._sharded_active() is False


def test_evaluate_cli_rejects_sie_for_non_sie_model(data_root):
    """--sie_cameras on a backbone without SIE embeddings must fail loudly
    instead of being swallowed by the factory's **kw (review fix)."""
    with pytest.raises(SystemExit, match="sie_cameras"):
        eval_cli.main(_eval_args(data_root, sie_cameras=2))


def test_evaluate_cli_rejects_gelu_approx_for_cnn(data_root):
    """--gelu_approx on a GELU-free CNN backbone must fail loudly, like the
    other factory-**kw flags."""
    with pytest.raises(SystemExit, match="gelu_approx"):
        eval_cli.main(_eval_args(data_root, model_name="resnet50", gelu_approx=True))


def test_train_cli_flag_validation(data_root, tmp_path):
    """Silently-ignored flags fail loudly: margin heads only exist on
    transreid_jpm, and raw camids must fit the SIE table (XLA's gather
    would clamp out-of-range ids onto the last row otherwise)."""
    from daliid_tpu.cli import train as train_cli

    def cfg(**over):
        argv = ["--dataset", "Market", "--data_root", data_root,
                "--img_height", "32", "--img_width", "16",
                "--path_to_save_models", str(tmp_path / "ckpt"),
                "--path_to_save_metrics", str(tmp_path / "metrics")]
        for k, v in over.items():
            argv += [f"--{k}", str(v)]
        return train_cli.config_from_args(train_cli.build_argparser().parse_args(argv))

    # margin head on a backbone without one
    with pytest.raises(SystemExit, match="margin"):
        train_cli.main(cfg(model_name="resnet50", id_loss_type="arcface", num_classes="-1"))
    # SIE flag on a backbone without SIE embeddings
    with pytest.raises(SystemExit, match="SIE"):
        train_cli.main(cfg(model_name="resnet50", sie_cameras="4"))
    # SIE table too small for the dataset's raw (1-based) camids
    with pytest.raises(SystemExit, match="too small"):
        train_cli.main(cfg(model_name="transreid", sie_cameras="1"))


def test_train_cli_crash_resume(data_root, tmp_path, capsys):
    """The crash-resume channel: with no best-metric checkpoint written yet
    (eval_freq > epochs), a second invocation with --resume must pick up the
    per-epoch latest checkpoint and continue from the next epoch instead of
    restarting at 1 (beyond-reference: mainKIT.py persists best state_dicts
    only, so an interrupted reference run always restarts cold)."""
    from daliid_tpu.cli import train as train_cli
    from daliid_tpu.models.factory import MODEL_REGISTRY, register_model
    from daliid_tpu.models.vit import ViTReID

    if "tiny_vit_test" not in MODEL_REGISTRY:
        @register_model("tiny_vit_test")
        def _tiny(dtype=None, img_size=(32, 16), **kw):
            return ViTReID(img_size=img_size, patch_size=8, patch_stride=8, embed_dim=32,
                           depth=1, num_heads=2, drop_path_rate=0.0), 32

    def cfg(epochs):
        argv = ["--dataset", "Market", "--data_root", data_root,
                "--img_height", "32", "--img_width", "16",
                "--model_name", "tiny_vit_test", "--epochs", str(epochs),
                "--P", "3", "--K", "2", "--eval_freq", "100", "--ckpt_freq", "1",
                "--kind_of_transform", "0", "--compute_dtype", "float32",
                "--extractor_batch", "16",
                "--path_to_save_models", str(tmp_path / "ckpt"),
                "--path_to_save_metrics", str(tmp_path / "metrics")]
        return train_cli.config_from_args(train_cli.build_argparser().parse_args(argv))

    train_cli.main(cfg(epochs=2), skip_initial_eval=True)
    assert os.path.isdir(str(tmp_path / "ckpt" / "latest" / "2"))
    capsys.readouterr()

    train_cli.main(cfg(epochs=3), resume=True, skip_initial_eval=True)
    out = capsys.readouterr().out
    assert "Resumed from epoch 2" in out
    assert "Iteration number 3/3" in out
    assert "Iteration number 2/3" not in out  # epochs 1-2 were not re-run
    assert os.path.isdir(str(tmp_path / "ckpt" / "latest" / "3"))


def test_supervise_cli_auto_resume(data_root, tmp_path, capfd, monkeypatch):
    """Failure drill: --fault_inject_epoch crashes the trainer after epoch 2
    (before its crash-resume save); the supervisor detects the failure,
    relaunches with --resume, and the recovered run finishes all 3 epochs.
    Exercises cli/supervise.py end-to-end with real OS subprocesses."""
    from daliid_tpu.cli import supervise as sup_cli

    # child trainers must run the virtual CPU platform, not claim the chip
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    argv = [
        "--max_restarts", "2", "--backoff_seconds", "0", "--",
        "--dataset", "Market", "--data_root", data_root,
        "--img_height", "32", "--img_width", "16",
        "--model_name", "tiny_vit_smoke", "--epochs", "3",
        "--P", "3", "--K", "2", "--eval_freq", "100", "--ckpt_freq", "1",
        "--kind_of_transform", "0", "--compute_dtype", "float32",
        "--extractor_batch", "16", "--skip_initial_eval",
        "--fault_inject_epoch", "2",
        "--path_to_save_models", str(tmp_path / "ckpt"),
        "--path_to_save_metrics", str(tmp_path / "metrics"),
    ]
    rc = sup_cli.main(sup_cli.build_argparser().parse_args(argv))
    assert rc == 0
    cap = capfd.readouterr()
    out = cap.out + cap.err  # the child's crash traceback lands on stderr
    assert "fault injection: simulated crash after epoch 2" in out
    assert "[supervise] attempt 2" in out
    assert "Resumed from epoch 1" in out  # epoch 2's save was lost to the crash
    assert "[supervise] training completed after 2 attempt(s)" in out
    # the recovered run re-trained epoch 2 and finished epoch 3
    assert os.path.isdir(str(tmp_path / "ckpt" / "latest" / "3"))


def test_supervise_cli_gives_up_without_progress(tmp_path, capfd, monkeypatch):
    """A deterministic crash loop (bad dataset root → dies before any
    checkpoint) stops after max_restarts futile relaunches."""
    from daliid_tpu.cli import supervise as sup_cli

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    argv = [
        "--max_restarts", "1", "--backoff_seconds", "0", "--",
        "--dataset", "Market", "--data_root", str(tmp_path / "nowhere"),
        "--model_name", "tiny_vit_smoke", "--epochs", "1",
        "--path_to_save_models", str(tmp_path / "ckpt"),
        "--path_to_save_metrics", str(tmp_path / "metrics"),
    ]
    rc = sup_cli.main(sup_cli.build_argparser().parse_args(argv))
    assert rc != 0
    cap = capfd.readouterr()
    out = cap.out + cap.err
    assert "[supervise] attempt 2" in out
    assert "[supervise] attempt 3" not in out


def test_supervise_gang_straggler_watchdog(capfd):
    """Liveness watchdog (ADVICE r4): when one rank exits 0 but another
    hangs (e.g. deadlocked in a collective with no dead rank to trip the
    failure check), the gang is torn down after --straggler_timeout and
    reported failed instead of polling forever."""
    import subprocess as sp

    from daliid_tpu.cli import supervise as sup_cli

    real_popen = sp.Popen

    def fake_popen(cmd, **kw):
        rank = int(cmd[cmd.index("--process_id") + 1])
        body = "import sys; sys.exit(0)" if rank == 0 else "import time; time.sleep(120)"
        return real_popen([sys.executable, "-c", body])

    orig = sup_cli.subprocess.Popen
    sup_cli.subprocess.Popen = fake_popen
    try:
        t0 = time.time()
        rc, fail_elapsed = sup_cli._run_gang(
            [], 2, grace_seconds=0.5, straggler_timeout=2.0
        )
    finally:
        sup_cli.subprocess.Popen = orig
    assert rc == 1
    assert fail_elapsed is None  # a hang is never a bootstrap failure
    assert time.time() - t0 < 30
    out = capfd.readouterr().out
    assert "treating the gang as hung" in out


def test_supervise_multihost_one_runs_gang_and_guards_conflicts(tmp_path):
    """--multihost 1 is a real 1-rank gang (ADVICE r4): the rank-bootstrap
    conflict guard applies to it rather than silently falling through to
    the single-process path."""
    from daliid_tpu.cli import supervise as sup_cli

    argv = [
        "--multihost", "1", "--",
        "--dataset", "Market", "--data_root", str(tmp_path),
        "--path_to_save_models", str(tmp_path / "ckpt"),
        "--process_id", "0",
    ]
    with pytest.raises(SystemExit, match="owns the rank bootstrap"):
        sup_cli.main(sup_cli.build_argparser().parse_args(argv))


def test_supervise_bootstrap_failures_not_budgeted(tmp_path, capfd, monkeypatch):
    """A gang that dies within seconds of launch is classified as a
    coordinator-bootstrap failure (the _free_port TOCTOU, ADVICE r4) and
    retried on a fresh port without burning the restart budget — but the
    free retries are bounded, so a deterministic instant crash still gives
    up: with max_restarts=0 we see exactly 3 free retries + 1 budgeted
    failure = 4 attempts."""
    import subprocess as sp

    from daliid_tpu.cli import supervise as sup_cli

    real_popen = sp.Popen

    def fake_popen(cmd, **kw):
        return real_popen([sys.executable, "-c", "import sys; sys.exit(7)"])

    orig = sup_cli.subprocess.Popen
    sup_cli.subprocess.Popen = fake_popen
    # the classifier window is wall-clock; widen it so a loaded CI host's
    # slow process spawns can't push an instant crash past it
    monkeypatch.setattr(sup_cli, "_BOOTSTRAP_WINDOW_SECONDS", 120.0)
    argv = [
        "--multihost", "2", "--max_restarts", "0", "--backoff_seconds", "0",
        "--teardown_grace_seconds", "0.5", "--",
        "--dataset", "Market", "--data_root", str(tmp_path / "nowhere"),
        "--path_to_save_models", str(tmp_path / "ckpt"),
        "--path_to_save_metrics", str(tmp_path / "metrics"),
    ]
    try:
        rc = sup_cli.main(sup_cli.build_argparser().parse_args(argv))
    finally:
        sup_cli.subprocess.Popen = orig
    assert rc == 7
    out = capfd.readouterr().out
    assert "free retry 3/3" in out
    assert "[supervise] attempt 4" in out
    assert "[supervise] attempt 5" not in out


def test_search_cli_end_to_end(data_root, tmp_path, capsys):
    """Serving CLI: enroll the synthetic gallery, search its query split
    (int8 extraction), save + reload the index."""
    from daliid_tpu.cli import search as search_cli

    index_path = str(tmp_path / "gallery_index.npz")
    argv = [
        "--dataset", "Market", "--data_root", data_root,
        "--model_name", "resnet50", "--img_height", "32", "--img_width", "16",
        "--batch_size", "16", "--compute_dtype", "float32",
        "--quantize", "int8", "--topk", "3", "--save_index", index_path,
    ]
    args = search_cli.build_argparser().parse_args(argv)
    sims, ids, pids = search_cli.main(args)
    assert sims.shape[1] == 3 and pids.shape == sims.shape
    assert os.path.exists(index_path)
    out = capsys.readouterr().out
    assert "top-1 identity accuracy" in out

    # reuse the saved index (no gallery re-extraction)
    args2 = search_cli.build_argparser().parse_args(argv + ["--load_index", index_path])
    sims2, _, pids2 = search_cli.main(args2)
    np.testing.assert_array_equal(pids, pids2)

    # SQ8 device gallery (--index_quantize): same identity decisions
    args3 = search_cli.build_argparser().parse_args(
        argv + ["--load_index", index_path, "--index_quantize", "int8"]
    )
    sims3, _, pids3 = search_cli.main(args3)
    np.testing.assert_array_equal(pids[:, 0], pids3[:, 0])
    np.testing.assert_allclose(sims3, sims2, atol=0.02)


def test_export_cli_round_trip(tmp_path):
    """torch ↔ npz conversion CLI: an npz exported to a torch pickle and
    re-imported must round-trip every leaf bit-exactly."""
    import jax
    import jax.numpy as jnp

    from daliid_tpu.cli import export as export_cli
    from daliid_tpu.models import get_model
    from daliid_tpu.train.checkpoint import load_variables, save_variables

    bundle = get_model("resnet50", jax.random.key(3), img_size=(32, 16))
    npz0 = str(tmp_path / "w0.npz")
    pth = str(tmp_path / "w.pth")
    npz1 = str(tmp_path / "w1.npz")
    save_variables(npz0, bundle.variables)

    def run(inp, out):
        export_cli.main(export_cli.build_argparser().parse_args(
            ["--model_name", "resnet50", "--input", inp, "--output", out,
             "--img_height", "32", "--img_width", "16"]))

    run(npz0, pth)
    run(pth, npz1)
    back = load_variables(npz1, bundle.variables)
    flat0 = jax.tree_util.tree_leaves_with_path(bundle.variables)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(back))
    assert flat0 and len(flat0) == len(flat1)
    for path, leaf in flat0:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat1[path]), err_msg=str(path))


def test_export_cli_rejects_ambiguous_direction(tmp_path):
    from daliid_tpu.cli import export as export_cli

    with pytest.raises(SystemExit, match="torch pickle"):
        export_cli.main(export_cli.build_argparser().parse_args(
            ["--model_name", "resnet50", "--input", "a.npz", "--output", "b.npz"]))


def test_evaluate_cli_multihead_magnitude_weighting(data_root):
    """--multiple_output with --head_weighting magnitude: the reference's
    per-pair max-norm ensemble variant (evaluate.py:247-249)."""
    results = eval_cli.main(_eval_args(
        data_root, model_name="multiview_resnet50", multiple_output=True,
        head_weighting="magnitude",
    ))
    cmc, mAP = results["Market"]
    assert 0.0 <= mAP <= 1.0 and 0.0 <= cmc[0] <= 1.0


def test_evaluate_cli_rerank(data_root):
    """--rerank applies k-reciprocal re-ranking before the metrics (the
    reference's commented path, evaluate.py:296-301)."""
    results = eval_cli.main(_eval_args(data_root, rerank=True))
    cmc, mAP = results["Market"]
    assert 0.0 <= mAP <= 1.0 and 0.0 <= cmc[0] <= 1.0


def test_evaluate_cli_flag_combinations_fail_loudly(data_root):
    """Ensemble/rerank flags that would silently not apply must error
    (review fix): rerank is single-output only, head weighting needs
    --multiple_output, and --multiple_output needs a multi-head model."""
    with pytest.raises(SystemExit, match="single-output"):
        eval_cli.main(_eval_args(data_root, rerank=True, multiple_output=True))
    with pytest.raises(SystemExit, match="head_weighting"):
        eval_cli.main(_eval_args(data_root, head_weighting="magnitude"))
    with pytest.raises(SystemExit, match="multi-head"):
        eval_cli.main(_eval_args(data_root, multiple_output=True))


def test_umbrella_entry_point():
    """`python -m daliid_tpu <cmd>` dispatches to the cli modules; unknown
    commands and bare invocation fail with usage (exit 2), --help exits 0."""
    import daliid_tpu.__main__ as um

    with pytest.raises(SystemExit) as e:
        um.main(["--help"])
    assert e.value.code == 0
    with pytest.raises(SystemExit) as e:
        um.main([])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        um.main(["frobnicate"])
    assert e.value.code == 2
    # a real dispatch: stats --help must run cli.stats's argparse (exit 0)
    with pytest.raises(SystemExit) as e:
        um.main(["stats", "--help"])
    assert e.value.code == 0
    # every advertised command resolves to an importable module
    import importlib

    for name, (mod, _) in um.COMMANDS.items():
        assert importlib.import_module(f"daliid_tpu.{mod}")
