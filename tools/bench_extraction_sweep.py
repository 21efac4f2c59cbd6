"""Extraction-throughput sweep on the real chip: batch size, donation,
and input-layout experiments for the flagship ResNet-50 forward.

Prints one line per config; used to decide bench.py's shape and to find
headroom beyond the recorded 14.3k img/s (BENCH.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(label, fn, args, batch, n_iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rate = batch * n_iters / dt
    print(f"{label:48s} {dt / n_iters * 1e3:8.2f} ms/iter  {rate:10.0f} img/s")
    return rate


def main():
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from daliid_tpu.augment.preprocess import normalize_images
    from daliid_tpu.models import get_model
    from daliid_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding

    img_size = (256, 128)
    mesh = make_mesh()
    bundle = get_model("resnet50", jax.random.key(0), img_size=img_size, dtype=jnp.bfloat16)
    variables = jax.device_put(bundle.variables, replicated_sharding(mesh))
    shard = batch_sharding(mesh)
    module = bundle.module
    rng = np.random.default_rng(0)

    def forward(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        return module.apply(variables, x, train=False).astype(jnp.float32)

    for batch in (256, 512, 1024):
        imgs = jax.device_put(
            rng.integers(0, 256, size=(batch, *img_size, 3), dtype=np.uint8), shard
        )
        measure(f"jit forward b={batch}", jax.jit(forward), (variables, imgs), batch)

    # bf16 output (skip the f32 cast)
    def forward_bf16_out(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        return module.apply(variables, x, train=False)

    batch = 512
    imgs = jax.device_put(rng.integers(0, 256, size=(batch, *img_size, 3), dtype=np.uint8), shard)
    measure("jit forward b=512 bf16-out", jax.jit(forward_bf16_out), (variables, imgs), batch)

    # feature='gap' (skip GMP) — isolates head cost
    bundle_gap = get_model(
        "resnet50", jax.random.key(0), img_size=img_size, dtype=jnp.bfloat16, feature="gap"
    )
    vars_gap = jax.device_put(bundle_gap.variables, replicated_sharding(mesh))

    def forward_gap(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        return bundle_gap.module.apply(variables, x, train=False).astype(jnp.float32)

    measure("jit forward b=512 gap-only", jax.jit(forward_gap), (vars_gap, imgs), batch)

    # last_stride=2 (the torchvision default) — isolates the stride-1 stage-4 cost
    bundle_s2 = get_model(
        "resnet50", jax.random.key(0), img_size=img_size, dtype=jnp.bfloat16, last_stride=2
    )
    vars_s2 = jax.device_put(bundle_s2.variables, replicated_sharding(mesh))

    def forward_s2(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        return bundle_s2.module.apply(variables, x, train=False).astype(jnp.float32)

    measure("jit forward b=512 last-stride-2", jax.jit(forward_s2), (vars_s2, imgs), batch)

    # cost analysis of the protocol config
    lowered = jax.jit(forward).lower(variables, imgs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"cost_analysis flops/batch: {flops:.3e}  ({flops / batch / 1e9:.2f} GF/img)")


if __name__ == "__main__":
    main()
