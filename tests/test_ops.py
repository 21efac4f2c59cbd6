"""Pallas kernels: fused attention parity + gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.ops import flash_attention


def _sdpa_reference(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


@pytest.mark.parametrize("n,d", [(129, 64), (16, 32), (211, 64)])
def test_flash_attention_matches_sdpa(rng, n, d):
    B, H = 2, 3
    q = jnp.asarray(rng.normal(size=(B, n, H, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, n, H, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, n, H, d)).astype(np.float32))
    out = flash_attention(q, k, v)
    ref = _sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_attention_grads_match(rng):
    B, N, H, D = 1, 20, 2, 16
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_reference(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5)


def test_vit_with_pallas_attention(rng):
    from daliid_tpu.models.vit import ViTReID

    x = jnp.asarray(rng.normal(size=(2, 32, 16, 3)).astype(np.float32))
    kw = dict(img_size=(32, 16), patch_size=8, patch_stride=8, embed_dim=64,
              depth=2, num_heads=4, drop_path_rate=0.0)
    m_ref = ViTReID(**kw)
    m_pal = ViTReID(use_pallas_attention=True, **kw)
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    out_ref = m_ref.apply(v, x, train=False)
    out_pal = m_pal.apply(v, x, train=False)  # same params work for both
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-4, rtol=1e-4)
