"""DeepChange-scale ranking stress run on the real chip (VERDICT item 9).

Exercises the full eval tail at the reference's largest protocol size —
17,527 queries x 62,956 gallery (SURVEY.md §6 dataset scales) — with
synthetic 2048-d embeddings:

1. distance matrix (one MXU matmul, 17.5k x 63k f32 ≈ 4.4 GB);
2. on-device Market-protocol CMC/mAP (`evaluate_rank_jax`, query-chunked);
3. correctness spot-check of the result vs the numpy oracle on a subsample;
4. HBM headroom from the compiled program's memory analysis.

Usage: python tools/bench_deepchange_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from daliid_tpu.metrics.ranking import (
        cosine_distance_matrix,
        evaluate_rank_jax,
        evaluate_rank_numpy,
    )

    NQ, NG, D, IDS, CAMS = 17_527, 62_956, 2048, 521, 17
    rng = np.random.default_rng(12)
    dev = jax.devices()[0]

    # identity-clustered embeddings with heavy noise so CMC/mAP land in a
    # realistic (non-saturated) band
    id_centers = rng.normal(size=(IDS, D)).astype(np.float32)

    def make(n):
        pids = rng.integers(0, IDS, n)
        camids = rng.integers(0, CAMS, n)
        fvs = id_centers[pids] + 12.0 * rng.normal(size=(n, D)).astype(np.float32)
        return fvs.astype(np.float32), pids.astype(np.int32), camids.astype(np.int32)

    q_fvs, q_pids, q_camids = make(NQ)
    g_fvs, g_pids, g_camids = make(NG)

    q = jax.device_put(q_fvs, dev)
    g = jax.device_put(g_fvs, dev)
    qp, qc = jax.device_put(q_pids, dev), jax.device_put(q_camids, dev)
    gp, gc = jax.device_put(g_pids, dev), jax.device_put(g_camids, dev)

    # This harness's async tunnel makes host-side block_until_ready timing
    # unreliable for single dispatches; device-side op durations from an
    # xprof trace are authoritative.
    import collections
    import glob
    import gzip
    import json as json_mod
    import re

    def device_ms_from_trace(tdir):
        """Device busy time as the UNION of device-lane op spans.

        A flat sum of event durations double-counts nested events — a
        `while` wrapper (any lax.map/scan program) carries the full loop
        duration AND its body ops appear as separate events. Rounds 2-4
        reported ranking device times with the flat sum, overstating the
        XLA-scan route ~2.7x (1,160 ms reported vs 431 ms true busy —
        see BENCH.md §ranking-pallas correction)."""
        fpath = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
        data = json_mod.load(gzip.open(fpath))
        pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pids = {p for p, n in pids.items() if "TPU" in n}
        spans = []
        for e in data["traceEvents"]:
            if (e.get("ph") == "X" and e.get("pid") in dev_pids
                    and not e["name"].startswith("jit_")
                    and not re.fullmatch(r"\d+", e["name"])):
                spans.append((e["ts"], e["ts"] + e.get("dur", 0)))
        spans.sort()
        busy, cur_s, cur_e = 0.0, None, None
        for s, e2 in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e2
            else:
                cur_e = max(cur_e, e2)
        if cur_e is not None:
            busy += cur_e - cur_s
        return busy / 1e3

    dist_fn = jax.jit(cosine_distance_matrix)
    distmat = dist_fn(q, g)
    distmat.block_until_ready()
    import tempfile

    tdir = tempfile.mkdtemp(prefix="dc_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            distmat = dist_fn(q, g)
        jax.block_until_ready(distmat)
        time.sleep(0.5)
    dist_s = device_ms_from_trace(tdir) / 3 / 1e3
    print(f"distmat {NQ}x{NG} (f32, {NQ * NG * 4 / 2**30:.2f} GiB): {dist_s * 1e3:.0f} ms "
          f"device time ({2 * NQ * NG * D / dist_s / 1e12:.0f} TF/s)")

    # both counting-core routes: the XLA lax.map scan (round 2) and the
    # Pallas VMEM-sweep kernel (round 5, ops/rank_counts.py) — the
    # DALIID_RANK_PALLAS env gate is read per call
    results = {}
    for route, env in (("xla-scan", "0"), ("pallas", "1")):
        os.environ["DALIID_RANK_PALLAS"] = env

        def rank_fn(d):
            return evaluate_rank_jax(d, qp, gp, qc, gc, max_rank=50, query_chunk=512)

        t0 = time.perf_counter()
        cmc, mAP = rank_fn(distmat)
        cmc_h, map_h = np.asarray(cmc), float(mAP)  # full fetch = real sync
        compile_s = time.perf_counter() - t0
        tdir = tempfile.mkdtemp(prefix="dc_trace_")
        with jax.profiler.trace(tdir):
            for _ in range(3):
                cmc, mAP = rank_fn(distmat)
            jax.block_until_ready((cmc, mAP))
            time.sleep(0.5)
        rank_s = device_ms_from_trace(tdir) / 3 / 1e3
        results[route] = (rank_s, cmc_h, map_h)
        print(f"on-device CMC/mAP over full {NQ}x{NG} [{route}]: "
              f"{rank_s * 1e3:.0f} ms device time "
              f"(first call incl. compile {compile_s:.2f} s)")
        print(f"R1={cmc_h[0]:.4f} R5={cmc_h[4]:.4f} mAP={map_h:.4f}")
    rank_s, cmc_h, map_h = results["pallas"]
    np.testing.assert_allclose(results["xla-scan"][1], cmc_h, atol=1e-6)
    assert abs(results["xla-scan"][2] - map_h) < 1e-6
    print(f"route parity OK; pallas speedup "
          f"{results['xla-scan'][0] / max(rank_s, 1e-9):.2f}x")
    os.environ["DALIID_RANK_PALLAS"] = "1"

    # correctness spot-check on a query subsample vs the numpy oracle
    sub = rng.choice(NQ, 256, replace=False)
    cmc_np, map_np = evaluate_rank_numpy(
        np.asarray(distmat)[sub], q_pids[sub], g_pids, q_camids[sub], g_camids, max_rank=50
    )
    cmc_dev, map_dev = evaluate_rank_jax(
        jax.device_put(np.asarray(distmat)[sub], dev),
        jax.device_put(q_pids[sub], dev), gp,
        jax.device_put(q_camids[sub], dev), gc, max_rank=50,
    )
    np.testing.assert_allclose(np.asarray(cmc_dev), cmc_np, atol=1e-5)
    np.testing.assert_allclose(float(map_dev), map_np, atol=1e-5)
    print("subsample parity vs numpy oracle: OK")

    # HBM headroom for the ranking program (the XLA route — tracing inside
    # jit falls back to it by design; the pallas route's peak is the stripe,
    # ~0.5 GiB transposed + the 4.11 GiB resident distmat)
    lowered = jax.jit(
        lambda d: evaluate_rank_jax(d, qp, gp, qc, gc, max_rank=50, query_chunk=512)
    ).lower(distmat)
    mem = lowered.compile().memory_analysis()
    if mem is not None:
        print(f"ranking program HBM: args {mem.argument_size_in_bytes / 2**30:.2f} GiB, "
              f"temps {mem.temp_size_in_bytes / 2**30:.3f} GiB, "
              f"output {mem.output_size_in_bytes / 2**20:.2f} MiB")

    # The user-facing sharded flow (Validator/evaluate CLI route on meshes,
    # evaluate_rank_sharded): embeddings -> per-device distance rows ->
    # psum-merged CMC/AP, never materializing the (Q, G) matrix. On this
    # 1-chip harness it exercises the identical shard_map program a pod runs.
    from daliid_tpu.metrics.ranking import evaluate_rank_sharded
    from daliid_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    t0 = time.perf_counter()
    cmc_sh, map_sh = evaluate_rank_sharded(
        q_fvs, g_fvs, q_pids, g_pids, q_camids, g_camids, mesh=mesh, max_rank=50
    )
    shard_total = time.perf_counter() - t0
    np.testing.assert_allclose(cmc_sh[:20], cmc_h[:20], atol=2e-5)
    assert abs(map_sh - map_h) < 2e-5
    print(f"sharded end-to-end (embeddings -> CMC/mAP, {mesh.devices.size} dev): "
          f"{shard_total:.2f} s wall incl. compile+transfer; parity OK")

    import json

    print(json.dumps({
        "distmat_s": dist_s, "rank_warm_s": rank_s,
        "rank_xla_s": results["xla-scan"][0],
        "rank_pallas_s": results["pallas"][0],
        "sharded_total_s": shard_total,
        "r1": float(cmc_h[0]), "map": map_h,
    }))


if __name__ == "__main__":
    main()
