"""Hardware reality-check: int8 vs bf16 MXU throughput on this chip.

Before building an int8 post-training-quantization inference path, measure
whether XLA:TPU actually lowers int8 matmuls/convs to the int8 MXU mode
(nominally 2x bf16 peak on v5e) rather than upcasting.

Wall-clock timing through this harness's tunnel is unusable: completion is
acked before the device finishes, so per-dispatch walls read orders of
magnitude above hardware peak (both naive timing and an in-program
fori_loop chain mismeasured). This tool therefore uses the repo's
established methodology (tools/profile_eval_forward.py): capture an xprof
trace of N dispatches and aggregate the DEVICE-side op durations.

Shapes are the flagship ResNet-50 extraction hot spots (BENCH.md roofline:
layer1 is HBM-bound, layer4 MXU-bound) plus square GEMMs as pure-MXU
probes. int8 "TOPS" are counted with the same 2*M*N*K convention so the
columns compare directly.

Usage: python tools/bench_int8_mxu.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_eval_forward import aggregate_trace  # noqa: E402  (tools/ sibling)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from daliid_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def device_seconds_per_iter(fn, args_, iters):
    """Trace ``iters`` dispatches of jit'd ``fn`` and return mean device
    seconds per dispatch (sum of device-lane op durations / iters)."""
    f = jax.jit(fn)
    jax.block_until_ready(f(*args_))  # compile
    tdir = tempfile.mkdtemp(prefix="int8mxu_")
    try:
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                out = f(*args_)
            jax.block_until_ready(out)
        _, totals, _ = aggregate_trace(tdir)
        total_us = sum(totals.values())
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return total_us / iters / 1e6


def gemm_case(m, n, k, dtype, iters, rng):
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
        fn = lambda a, b: lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
    else:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        fn = lambda a, b: lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
    dt = device_seconds_per_iter(fn, (a, b), iters)
    return 2 * m * n * k / dt / 1e12, dt


def dynquant_gemm_case(m, n, k, iters, rng):
    """The full Dense dynamic-int8 chain (ops/quantize.py:_quantized_dense):
    per-row absmax → quantize → int8 dot → dequant, from a bf16 input.
    Isolates how much of the pure-int8-GEMM win the quantize glue eats."""
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    def fn(x, w):
        s_in = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127).astype(jnp.int8)
        s_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s_in * s_w).astype(jnp.bfloat16)

    dt = device_seconds_per_iter(fn, (x, w), iters)
    return 2 * m * n * k / dt / 1e12, dt


def conv_case(b, h, w, cin, cout, kh, kw, stride, dtype, iters, rng):
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin), np.int8))
        k = jnp.asarray(rng.integers(-127, 127, (kh, kw, cin, cout), np.int8))
        pref = jnp.int32
    else:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)), jnp.bfloat16)
        pref = jnp.float32
    fn = lambda x, k: lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=pref)
    dt = device_seconds_per_iter(fn, (x, k), iters)
    out_h, out_w = h // stride, w // stride
    flops = 2 * b * out_h * out_w * cout * kh * kw * cin
    return flops / dt / 1e12, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    print(f"{'case':<42} {'dtype':>6} {'TFLOP/s':>9} {'ms':>8}")
    # square pure-MXU probes + the ViT-B extraction matmul shapes at the
    # bench batch (512 imgs x 129 tokens = 66048 rows; qkv/fc1 K=768,
    # fc2 K=3072 — tools/profile_eval_forward.py --model vit)
    for m, n, k in [
        (4096, 4096, 4096),
        (8192, 8192, 8192),
        (66048, 2304, 768),   # vit qkv
        (66048, 3072, 768),   # vit fc1
        (66048, 768, 3072),   # vit fc2
    ]:
        for dtype in ("bf16", "int8"):
            tf, dt = gemm_case(m, n, k, dtype, args.iters, rng)
            print(f"gemm {m}x{n}x{k:<24} {dtype:>6} {tf:9.2f} {dt*1e3:8.3f}", flush=True)
        tf, dt = dynquant_gemm_case(m, n, k, args.iters, rng)
        print(f"gemm {m}x{n}x{k:<24} {'dynq8':>6} {tf:9.2f} {dt*1e3:8.3f}", flush=True)

    # ResNet-50 extraction hot convs at the bench batch (512, 256x128 input):
    # layer1 3x3 (HBM-bound in the roofline) and layer4 3x3 (MXU-bound)
    convs = [
        ("l1 3x3 64x64 s1 64x32", 512, 64, 32, 64, 64, 3, 3, 1),
        ("l4 3x3 512x512 s1 16x8", 512, 16, 8, 512, 512, 3, 3, 1),
        ("l4 1x1 2048->512 16x8", 512, 16, 8, 2048, 512, 1, 1, 1),
    ]
    for name, b, h, w, cin, cout, kh, kw, s in convs:
        for dtype in ("bf16", "int8"):
            tf, dt = conv_case(b, h, w, cin, cout, kh, kw, s, dtype, args.iters, rng)
            print(f"conv {name:<37} {dtype:>6} {tf:9.2f} {dt*1e3:8.3f}", flush=True)


if __name__ == "__main__":
    main()
