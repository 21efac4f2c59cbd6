"""Full Market-1501-protocol evaluation, end-to-end on one chip.

Measures the complete eval tail at the reference's Market scale — 3,368
query + 15,913 gallery embeddings from the ResNet-50 forward, cosine
distance matrix, Market-protocol CMC/mAP — with device-resident uint8
batches (the harness tunnel is the documented artifact; a real host feeds
uint8 batches over PCIe at negligible cost, see BENCH.md).

Reference comparison: the eval logs spend 18.0-19.4 s extracting the
gallery alone on one GPU (log_cross-domain_fusion_Market.txt) before the
host-side distmat + Cython ranking.

Usage: python tools/bench_market_eval.py
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

    from daliid_tpu.augment.preprocess import normalize_images
    from daliid_tpu.metrics.ranking import cosine_distance_matrix, evaluate_rank_jax
    from daliid_tpu.models import get_model
    from daliid_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding

    NQ, NG, IDS, CAMS = 3_368, 15_913, 751, 6
    img_size = (256, 128)
    batch = 512
    mesh = make_mesh()
    bundle = get_model("resnet50", jax.random.key(0), img_size=img_size, dtype=jnp.bfloat16)
    variables = jax.device_put(bundle.variables, replicated_sharding(mesh))
    shard = batch_sharding(mesh)
    module = bundle.module

    @jax.jit
    def forward(variables, images_u8):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        return module.apply(variables, x, train=False).astype(jnp.float32)

    rng = np.random.default_rng(0)
    n_imgs = NQ + NG
    n_batches = -(-n_imgs // batch)
    batches = [
        jax.device_put(
            rng.integers(0, 256, size=(batch, *img_size, 3), dtype=np.uint8), shard
        )
        for _ in range(2)
    ]
    q_pids = rng.integers(0, IDS, NQ).astype(np.int32)
    g_pids = rng.integers(0, IDS, NG).astype(np.int32)
    q_camids = rng.integers(0, CAMS, NQ).astype(np.int32)
    g_camids = rng.integers(0, CAMS, NG).astype(np.int32)

    # warm everything (compiles cached across runs)
    feats = forward(variables, batches[0])
    feats.block_until_ready()

    t0 = time.time()
    outs = [forward(variables, batches[i % 2]) for i in range(n_batches)]
    jax.block_until_ready(outs[-1])
    t_extract = time.time() - t0
    embs = jnp.concatenate(outs, axis=0)[:n_imgs]
    q_fvs, g_fvs = embs[:NQ], embs[NQ:]

    # warm distmat+rank
    dm = cosine_distance_matrix(q_fvs, g_fvs)
    out = evaluate_rank_jax(dm, jnp.asarray(q_pids), jnp.asarray(g_pids),
                            jnp.asarray(q_camids), jnp.asarray(g_camids))
    jax.block_until_ready(out)

    t0 = time.time()
    dm = cosine_distance_matrix(q_fvs, g_fvs)
    cmc, mAP = evaluate_rank_jax(dm, jnp.asarray(q_pids), jnp.asarray(g_pids),
                                 jnp.asarray(q_camids), jnp.asarray(g_camids))
    jax.block_until_ready((cmc, mAP))
    t_rank = time.time() - t0

    total = t_extract + t_rank
    print(f"extract {n_imgs} imgs @ {img_size}: {t_extract:.2f} s "
          f"({n_imgs / t_extract:.0f} img/s)")
    print(f"distmat ({NQ}x{NG}) + CMC/mAP ranking: {t_rank:.3f} s")
    print(f"full Market-protocol eval: {total:.2f} s "
          f"(reference: 18-19.4 s gallery extraction ALONE on one GPU)")


if __name__ == "__main__":
    main()
