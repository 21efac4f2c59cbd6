"""TransReID with the Jigsaw Patch Module (JPM) in flax.

Re-implements ``build_transformer_local`` (``Person-ReID/make_models.py:221-389``):

- trunk: overlapping-patch ViT run to depth-1, returning the token sequence
  (``local_feature`` mode, ``vit_pytorch.py:375-404``);
- global branch b1: one transformer block + layer norm → cls token
  (``make_models.py:249-254,318-320``);
- JPM branch: patch shift + group shuffle (``shuffle_unit``,
  ``make_models.py:8-25``), then 4 patch chunks each prepended with the cls
  token through a *shared* second block b2 (``make_models.py:322-349``);
- 5 BN necks; train mode returns (per-branch classifier logits, pre-neck
  features) for ID+triplet losses (``make_models.py:351-370``);
- eval returns ``concat([global, local_1/4 .. local_4/4])``
  (``make_models.py:371-377``), before- or after-neck per ``neck_feat``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from daliid_tpu.models.norm import TorchBatchNorm

from daliid_tpu.models.vit import ViTReID, remat_block_cls


def shuffle_unit(features: jnp.ndarray, shift: int, group: int, begin: int = 1) -> jnp.ndarray:
    """Patch shift + group shuffle over (B, N, C) tokens (cls at index 0 is
    dropped). Mirrors ``make_models.py:8-25`` including its pad-on-ragged
    behavior (duplicate the second-to-last token)."""
    b, _, c = features.shape
    x = jnp.concatenate(
        [features[:, begin - 1 + shift :], features[:, begin : begin - 1 + shift]], axis=1
    )
    n = x.shape[1]
    if n % group != 0:
        x = jnp.concatenate([x, x[:, -2:-1]], axis=1)
        n = x.shape[1]
    x = x.reshape(b, group, n // group, c)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, c)
    return x


class TransReIDJPM(nn.Module):
    """TransReID + JPM. Train → (list of 5 logits, list of 5 features);
    eval → (B, 5*embed_dim) concatenated embedding."""

    img_size: tuple = (256, 128)
    patch_size: int = 16
    patch_stride: int = 12
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    sie_cameras: int = 0
    sie_views: int = 0
    sie_coef: float = 1.5  # sie_xishu factory default (vit_pytorch.py:453,461)
    num_classes: int = 0
    divide_length: int = 4      # cfg.MODEL.DEVIDE_LENGTH
    shift_num: int = 5          # cfg.MODEL.SHIFT_NUM
    shuffle_groups: int = 2     # cfg.MODEL.SHUFFLE_GROUP
    rearrange: bool = True      # cfg.MODEL.RE_ARRANGE
    neck_feat: str = "before"   # cfg.TEST.NECK_FEAT
    id_loss_type: str = "softmax"  # cfg.MODEL.ID_LOSS_TYPE: 'softmax' or a
                                   # margin head (arcface/cosface/amsoftmax/
                                   # circle, make_models.py:260-277)
    margin_s: float | None = None  # cfg.SOLVER.COSINE_SCALE (None = per-head default)
    margin_m: float | None = None  # cfg.SOLVER.COSINE_MARGIN
    gelu_approx: bool = False   # tanh GELU (see models/vit.py — non-parity, opt-in)
    use_pallas_attention: bool = False  # fused-attention kernel (models/vit.py)
    remat: str = "none"         # trunk + branch-block remat (vit.REMAT_MODES)
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_dim(self):
        return 5 * self.embed_dim

    @nn.compact
    def __call__(self, x, camera_ids=None, view_ids=None, labels=None, train: bool = False):
        trunk = ViTReID(
            img_size=self.img_size,
            patch_size=self.patch_size,
            patch_stride=self.patch_stride,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            sie_cameras=self.sie_cameras,
            sie_views=self.sie_views,
            sie_coef=self.sie_coef,
            local_feature=True,
            gelu_approx=self.gelu_approx,
            use_pallas_attention=self.use_pallas_attention,
            remat=self.remat,
            dtype=self.dtype,
            name="base",
        )
        tokens = trunk(x, camera_ids=camera_ids, view_ids=view_ids, train=train)

        def branch_block(name):
            BlockCls = remat_block_cls(self.remat)
            blk = BlockCls(self.num_heads, self.mlp_ratio, 0.0, gelu_approx=self.gelu_approx,
                           use_pallas_attention=self.use_pallas_attention,
                           dtype=self.dtype, name=f"{name}_block")
            ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"{name}_norm")
            return lambda t: ln(blk(t.astype(self.dtype), train)).astype(jnp.float32)

        b1 = branch_block("b1")
        b2 = branch_block("b2")  # shared across the 4 local chunks (make_models.py:333-348)

        global_feat = b1(tokens)[:, 0]

        feature_length = tokens.shape[1] - 1
        patch_length = feature_length // self.divide_length
        cls = tokens[:, :1]
        rest = shuffle_unit(tokens, self.shift_num, self.shuffle_groups) if self.rearrange else tokens[:, 1:]

        locals_ = []
        for i in range(self.divide_length):
            chunk = rest[:, i * patch_length : (i + 1) * patch_length]
            locals_.append(b2(jnp.concatenate([cls, chunk], axis=1))[:, 0])

        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=name
        )
        feat = bn("bottleneck")(global_feat)
        local_bns = [bn(f"bottleneck_{i+1}")(lf) for i, lf in enumerate(locals_)]

        if self.num_classes:
            # heads are created in every mode so init(train=False) carries
            # them; the eval path discards the logits (XLA DCEs the compute)
            cls_head = lambda name: nn.Dense(
                self.num_classes, use_bias=False, dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.001), name=name,
            )
            global_head = cls_head("classifier")
            scores = [global_head(feat)] + [
                cls_head(f"classifier_{i+1}")(lbn) for i, lbn in enumerate(local_bns)
            ]
            if train:
                if self.id_loss_type != "softmax" and labels is not None:
                    # margin heads apply to the GLOBAL post-neck feature only
                    # (classifier(feat, label), make_models.py:361-363); the
                    # local plain-softmax branches are not used upstream
                    from daliid_tpu.margins import margin_logits

                    kernel = global_head.variables["params"]["kernel"]
                    mkw = {}
                    if self.margin_s is not None:
                        mkw["s"] = self.margin_s
                    if self.margin_m is not None:
                        mkw["m"] = self.margin_m
                    scores = [margin_logits(self.id_loss_type, feat, kernel, labels, **mkw)]
                return scores, [global_feat] + locals_

        if self.neck_feat == "after":
            parts = [feat] + [lbn / 4.0 for lbn in local_bns]
        else:
            parts = [global_feat] + [lf / 4.0 for lf in locals_]
        return jnp.concatenate(parts, axis=1)
