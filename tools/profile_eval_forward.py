"""Per-fusion device-time profile of the flagship extraction forward.

Captures a jax.profiler trace of the jit'd ResNet-50 eval forward (the
bench.py program) and aggregates TPU op durations by fusion, so the
time split between the early high-spatial stages and the dense stage-4
convs is measured instead of inferred (companion to
tools/bench_extraction_sweep.py's stride/batch ablation).

Usage: python tools/profile_eval_forward.py [--batch 512] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir: str):
    """Sum device-op durations by event name from the newest xprof trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process name mentions TPU/device XLA ops
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        pid for pid, name in proc_names.items()
        if "TPU" in name or "/device" in name.lower() or "XLA Ops" in name
    }
    totals = collections.Counter()
    counts = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid")
        if device_pids and pid not in device_pids:
            continue
        name = ev.get("name", "?")
        totals[name] += ev["dur"]
        counts[name] += 1
    return path, totals, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="resnet50")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--quantize", type=str, default=None, choices=["int8"],
                    help="profile the int8 PTQ forward (ops/quantize.py)")
    ap.add_argument("--gelu_approx", action="store_true",
                    help="ViT family: tanh-approx GELU (models/vit.py)")
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daliid_tpu.augment.preprocess import normalize_images
    from daliid_tpu.models import get_model
    from daliid_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding

    img_size = (256, 128)
    mesh = make_mesh()
    if args.gelu_approx:
        # same loud check as the eval CLI — the factory's **kw would
        # otherwise silently drop the flag for non-ViT models and this
        # tool would print timings the flag never affected
        from daliid_tpu.models.factory import GELU_APPROX_MODELS

        if args.model not in GELU_APPROX_MODELS:
            raise SystemExit(
                f"--gelu_approx only applies to {sorted(GELU_APPROX_MODELS)}; "
                f"got --model {args.model}"
            )
    model_kw = {"gelu_approx": True} if args.gelu_approx else {}
    bundle = get_model(args.model, jax.random.key(0), img_size=img_size,
                       dtype=jnp.bfloat16, **model_kw)
    variables = jax.device_put(bundle.variables, replicated_sharding(mesh))
    module = bundle.module
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 256, size=(args.batch, *img_size, 3), dtype=np.uint8),
        batch_sharding(mesh),
    )

    quant_scales = None
    if args.quantize == "int8":
        from daliid_tpu.ops.quantize import calibrate

        x = jax.jit(lambda u8: normalize_images(u8, dtype=jnp.bfloat16))(imgs)
        quant_scales = calibrate(module, variables, x, train=False)
        print(f"int8 calibration: {len(quant_scales)} convs")

    @jax.jit
    def forward(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        if quant_scales is None:
            out = module.apply(variables, x, train=False)
        else:
            from daliid_tpu.ops.quantize import quantized_apply

            out = quantized_apply(module, variables, quant_scales, x, train=False)
        # multi-head models (multipart/dual/multiview) return tuples
        return jax.tree.map(lambda f: f.astype(jnp.float32), out)

    compiled = jax.jit(forward).lower(variables, imgs).compile()
    # fusion name → source op_name metadata (flax scope path), from the
    # optimized HLO, so trace rows are attributable to layers
    import re

    op_names = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\"", compiled.as_text()
    ):
        op_names[m.group(1)] = m.group(2)

    forward(variables, imgs).block_until_ready()

    tdir = tempfile.mkdtemp(prefix="eval_fwd_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            out = forward(variables, imgs)
        out.block_until_ready()

    path, totals, counts = aggregate_trace(tdir)
    total_us = sum(totals.values())
    print(f"trace: {path}")
    print(f"device total across {args.iters} iters: {total_us / 1e3:.2f} ms "
          f"({total_us / 1e3 / args.iters:.2f} ms/iter)\n")
    print(f"{'fusion':16s} {'total ms':>9s} {'%':>6s}  source op")
    module_us = 0
    for name, us in totals.most_common():
        if name.startswith("jit_forward"):
            module_us += us
    body_us = total_us - module_us
    shown = 0
    for name, us in totals.most_common():
        if name.startswith("jit_forward"):
            continue
        src = op_names.get(name, "?")
        print(f"{name[:16]:16s} {us / 1e3:9.2f} {100 * us / body_us:6.1f}  {src[-90:]}")
        shown += 1
        if shown >= args.top:
            break

    # stage-level rollup from the op_name scopes
    stage_us = collections.Counter()
    for name, us in totals.items():
        if name.startswith("jit_forward"):
            continue
        src = op_names.get(name, "")
        m = re.search(r"(layer\d)_", src)
        if m:
            stage_us[m.group(1)] += us
        elif "conv1" in src or "bn1" in src or "max_pool" in src or "pad" in src:
            stage_us["stem"] += us
        else:
            stage_us["other"] += us
    print("\nstage rollup (device ms/iter):")
    for k in ("stem", "layer1", "layer2", "layer3", "layer4", "other"):
        if k in stage_us:
            print(f"  {k:8s} {stage_us[k] / 1e3 / args.iters:7.2f} ms  {100 * stage_us[k] / body_us:5.1f}%")


if __name__ == "__main__":
    main()
