"""ViT / TransReID backbone in flax — overlapping patches, SIE, drop-path.

TPU-native re-design of the reference's two ViT paths:

- the torchvision-ViT wrapper ``ViTReID`` (``Person-ReID/Encoders.py:767-828``):
  ViT-B/16 trunk, cls-token embedding, BN neck;
- the self-contained TransReID backbone (``Person-ReID/vit_pytorch.py:291-433``)
  with overlapping patch embedding (``PatchEmbed_overlap``,
  ``vit_pytorch.py:251-288``), SIE camera/view embeddings added to every
  token (``vit_pytorch.py:316-331,375-404``), and stochastic depth
  (``DropPath``, ``vit_pytorch.py:45-72``).

One configurable module covers both: set ``patch_stride == patch_size`` for
the vanilla ViT, smaller for overlapping TransReID patches; ``sie_cameras``/
``sie_views`` > 0 enables SIE. Attention uses ``jax.nn.dot_product_attention``
(fused flash path on TPU); sequence length is ≤ ~211 tokens (SURVEY.md §5 —
sequence parallelism is deliberately out of scope).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from daliid_tpu.models.norm import TorchBatchNorm

#: Remat modes for the transformer trunk (``remat=`` on :class:`ViTReID` /
#: :class:`TransReIDJPM`, ``--remat`` on the train CLI). At the protocol
#: batch (384 @ 256x128) ViT-B's saved activations (~17 GB) exceed v5e HBM,
#: so with ``none`` XLA auto-remats every block (~25% of the step is
#: recompute — BENCH.md §transformer-train). ``tuned`` checkpoints each
#: block explicitly but SAVES the qkv projections, the attention output,
#: and the post-norm2 activations (~9 GB at protocol batch — fits), so the
#: backward only recomputes the attention probs and the MLP hidden — the
#: two tensors too big to save — instead of the whole block. ``full`` saves
#: only block boundaries (minimum memory, maximum recompute).
#:
#: **Measured negative result — keep the default ``none``** (BENCH.md
#: §transformer-train, protocol batch on v5e): none 381 ms (1,000 img/s),
#: tuned 434 ms (880), full 464 ms (824). XLA's auto-remat pass chooses
#: recompute at *fusion* granularity under actual memory pressure;
#: ``jax.checkpoint`` forces block-granularity recompute and its
#: ``prevent_cse`` barriers inhibit cross-boundary fusion, which costs more
#: than the saved HBM traffic buys. The knob stays for bigger-than-protocol
#: batches/models where auto-remat may thrash. All three
#: compute the same math; ``jax.checkpoint`` moves XLA fusion boundaries, so
#: f32 outputs/grads differ by reduction reassociation — the same class of
#: difference as an XLA version bump (measured: jit-vs-eager on the
#: unmodified model shows the same-magnitude deltas, incl. O(1) rel-L2 on
#: cancellation-dominated LayerNorm bias grads). Equivalence is pinned in
#: f64, where every grad agrees to rel-L2 < 1e-6
#: (tests/test_models.py::test_remat_numerically_equivalent).
REMAT_MODES = ("none", "full", "tuned")


def remat_block_cls(remat: str):
    """Resolve the transformer Block class for a remat mode.

    Returned class must be called with positional ``(x, train)`` — ``train``
    is ``static_argnums`` under :func:`flax.linen.remat`.
    """
    if remat == "none":
        return Block
    if remat == "full":
        return nn.remat(Block, static_argnums=(2,))
    if remat == "tuned":
        return nn.remat(
            Block,
            static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names(
                "vit_qkv", "vit_attn_out", "vit_norm2"
            ),
        )
    raise ValueError(f"remat must be one of {REMAT_MODES}, got {remat!r}")


def drop_path(x, key, rate: float):
    """Per-sample stochastic depth (vit_pytorch.py:45-57)."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, shape=(x.shape[0],) + (1,) * (x.ndim - 1))
    return x / keep * mask


class Mlp(nn.Module):
    hidden: int
    out: int
    gelu_approx: bool = False  # tanh-approx GELU: measured +9.7% extraction
                               # throughput on v5e (erf upcasts to f32 in the
                               # fc2 fusion) but NOT parity with torch
                               # nn.GELU — opt-in for from-scratch training
                               # (BENCH.md §vit)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (vit_pytorch.py:139-164).

    ``use_pallas=True`` routes through the fused Pallas kernel
    (:mod:`daliid_tpu.ops.flash_attention`); otherwise XLA's fused SDPA.
    """

    num_heads: int
    qkv_bias: bool = True          # vit_small uses False (vit_pytorch.py:463)
    qk_scale: float | None = None  # None → head_dim**-0.5; vit_small pins
                                   # 768**-0.5 (vit_pytorch.py:462)
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = checkpoint_name(qkv, "vit_qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.num_heads, head_dim)

        # the kernel holds no params, so the XLA path during init() keeps
        # the variable tree identical while avoiding Pallas lowering on the
        # host-CPU eager init (factory.get_model inits under
        # default_device(cpu) while the default backend is TPU)
        if self.use_pallas and not self.is_initializing():
            from daliid_tpu.ops.flash_attention import flash_attention

            q = heads(q)
            if self.qk_scale is not None:
                # the kernel applies head_dim**-0.5 internally; fold the
                # custom scale into q so the net factor is qk_scale
                q = q * (self.qk_scale * head_dim**0.5)
            out = flash_attention(q, heads(k), heads(v))
        else:
            out = jax.nn.dot_product_attention(
                heads(q), heads(k), heads(v), scale=self.qk_scale
            )
        out = out.reshape(B, N, C).astype(self.dtype)
        out = checkpoint_name(out, "vit_attn_out")
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block with stochastic depth (vit_pytorch.py:167-184)."""

    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    gelu_approx: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.num_heads, qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            use_pallas=self.use_pallas_attention, dtype=self.dtype, name="attn",
        )(y, train)
        if train and self.drop_path_rate > 0.0:
            y = drop_path(y, self.make_rng("droppath"), self.drop_path_rate)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = checkpoint_name(y, "vit_norm2")
        y = Mlp(int(C * self.mlp_ratio), C, gelu_approx=self.gelu_approx,
                dtype=self.dtype, name="mlp")(y, train)
        if train and self.drop_path_rate > 0.0:
            y = drop_path(y, self.make_rng("droppath"), self.drop_path_rate)
        return x + y


def resize_pos_embed(pos_embed: np.ndarray, new_hw: tuple, old_hw: tuple) -> np.ndarray:
    """Bilinear grid interpolation of (1, 1+H*W, C) position embeddings when
    loading a checkpoint at a different resolution (vit_pytorch.py:436-450)."""
    cls_tok, grid = pos_embed[:, :1], pos_embed[:, 1:]
    oh, ow = old_hw
    nh, nw = new_hw
    c = grid.shape[-1]
    grid = grid.reshape(oh, ow, c)
    grid = jax.image.resize(jnp.asarray(grid), (nh, nw, c), method="bilinear")
    grid = np.asarray(grid).reshape(1, nh * nw, c)
    return np.concatenate([cls_tok, grid], axis=1)


class ViTReID(nn.Module):
    """ViT trunk + ReID head → (B, embed_dim) cls-token embedding after a BN
    neck (ViTReID head, ``Encoders.py:808-828``; TransReID forward_features,
    ``vit_pytorch.py:375-404``)."""

    img_size: tuple = (256, 128)
    patch_size: int = 16
    patch_stride: int = 16        # < patch_size → overlapping (TransReID)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1   # TransReID default stochastic depth
    qkv_bias: bool = True
    qk_scale: float | None = None
    gelu_approx: bool = False     # tanh GELU: +9.7% extraction throughput,
                                  # non-parity numerics (BENCH.md §vit)
    sie_cameras: int = 0          # >0 enables SIE camera embedding
    sie_views: int = 0
    sie_coef: float = 1.5         # sie_xishu default in every reference
                                  # factory (vit_pytorch.py:453,461,470);
                                  # --sie_coef overrides (cfg.MODEL.SIE_COE)
    local_feature: bool = False   # True → return token sequence before the
                                  # last block (TransReID JPM trunk mode,
                                  # vit_pytorch.py:375-404 local_feature path)
    use_pallas_attention: bool = False
    remat: str = "none"           # see REMAT_MODES; 'tuned' lifts the
                                  # auto-remat recompute at protocol batch
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_hw(self):
        h = (self.img_size[0] - self.patch_size) // self.patch_stride + 1
        w = (self.img_size[1] - self.patch_size) // self.patch_stride + 1
        return h, w

    @property
    def feature_dim(self):
        return self.embed_dim

    @nn.compact
    def __call__(self, x, camera_ids=None, view_ids=None, train: bool = False):
        B = x.shape[0]
        x = x.astype(self.dtype)
        # (Overlapping) patch embedding as a strided conv
        # (PatchEmbed_overlap, vit_pytorch.py:251-288).
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_stride, self.patch_stride),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.embed_dim)), x], axis=1)

        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, 1 + gh * gw, self.embed_dim)
        )
        x = x + pos.astype(self.dtype)

        # SIE camera/view embedding, added to all tokens scaled by sie_coef
        # (vit_pytorch.py:316-331,389-396).
        if self.sie_cameras > 0 or self.sie_views > 0:
            n_sie = max(self.sie_cameras, 1) * max(self.sie_views, 1)
            sie = self.param("sie_embed", nn.initializers.truncated_normal(0.02), (n_sie, 1, self.embed_dim))
            if self.sie_cameras > 0 and self.sie_views > 0:
                idx = camera_ids * self.sie_views + view_ids
            elif self.sie_cameras > 0:
                idx = camera_ids if camera_ids is not None else jnp.zeros((B,), jnp.int32)
            else:
                idx = view_ids if view_ids is not None else jnp.zeros((B,), jnp.int32)
            x = x + self.sie_coef * sie[idx].astype(self.dtype)

        # Linear drop-path schedule across depth (vit_pytorch.py:343-345).
        dprs = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        run_depth = self.depth - 1 if self.local_feature else self.depth
        BlockCls = remat_block_cls(self.remat)
        for i in range(run_depth):
            x = BlockCls(
                self.num_heads, self.mlp_ratio, dprs[i],
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                gelu_approx=self.gelu_approx,
                use_pallas_attention=self.use_pallas_attention,
                dtype=self.dtype, name=f"block{i}",
            )(x, train)

        if self.local_feature:
            # JPM trunk: unnormed token sequence before the last block
            return x.astype(jnp.float32)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = x[:, 0].astype(jnp.float32)
        out = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="last_bn",
        )(cls_out)
        return out


def vit_base_reid(**kw) -> ViTReID:
    """ViT-B/16 ReID (vit_pytorch.py:453-460 factory equivalent)."""
    return ViTReID(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_small_reid(**kw) -> ViTReID:
    """The reference's `vit_small` shape, exactly
    (``vit_small_patch16_224_TransReID``, vit_pytorch.py:461-468): embed 768,
    depth 8, heads 8, mlp_ratio 3, no qkv bias, qk_scale 768^-0.5 — a
    reference vit_small checkpoint loads unchanged."""
    return ViTReID(
        embed_dim=768, depth=8, num_heads=8, mlp_ratio=3.0,
        qkv_bias=False, qk_scale=768**-0.5, **kw,
    )


def deit_small_reid(**kw) -> ViTReID:
    """DeiT-small shape (``deit_small_patch16_224_TransReID``,
    vit_pytorch.py:470-476): embed 384, depth 12, heads 6."""
    return ViTReID(embed_dim=384, depth=12, num_heads=6, **kw)


def transreid_base(img_size=(256, 128), sie_cameras=0, sie_views=0, **kw) -> ViTReID:
    """TransReID ViT-B with overlapping stride-12 patches + SIE
    (make_models.py:121-218 build path)."""
    return ViTReID(
        img_size=img_size,
        patch_stride=12,
        sie_cameras=sie_cameras,
        sie_views=sie_views,
        **kw,
    )
