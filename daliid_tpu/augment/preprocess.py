"""Eval-path preprocessing: host bicubic decode/resize + on-device normalize.

The reference's eval transform is ``Resize(bicubic) → ToTensor → Normalize``
(``Person-ReID/getFeatures.py:18-19``), executed per-image on 8 DataLoader
worker processes. The TPU split here:

- **host**: JPEG decode + PIL bicubic resize to the static (H, W) — matching
  torchvision's PIL-backend Resize bit-for-bit, which matters for metric
  parity with ported weights — emitting uint8 HWC;
- **device**: a single fused uint8→float ``(x/255 - mean)/std`` normalize,
  done *inside* the jit'd forward so XLA fuses it with the first conv and
  the host→device transfer stays uint8 (4x less PCIe/DMA traffic than f32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def decode_resize(path: str, height: int, width: int) -> np.ndarray:
    """Host-side decode + bicubic resize → uint8 (H, W, 3).

    PIL bicubic matches the reference transform
    (``Resize(..., interpolation=BICUBIC)``, ``getFeatures.py:18``,
    ``train_encodersKIT.py:313``). Retries/converts like torchreid's
    ``read_image`` (RGB convert).
    """
    img = Image.open(path).convert("RGB")
    if img.size != (width, height):
        img = img.resize((width, height), Image.BICUBIC)
    return np.asarray(img, dtype=np.uint8)


def normalize_images(
    images_u8: jnp.ndarray,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused ``(x/255 - mean)/std`` over a (B, H, W, 3) uint8 batch.

    Equivalent to ``ToTensor() + Normalize(...)`` (``getFeatures.py:18-19``)
    but batched, NHWC, and emitted in the compute dtype (bf16 on TPU) so the
    first conv reads MXU-ready data.
    """
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    scale = (1.0 / 255.0) / std          # fold /255 into the affine
    bias = -mean / std
    x = images_u8.astype(jnp.float32) * scale + bias
    return x.astype(dtype)
