"""Train-time augmentation as one batched, jit-compiled device program.

Replicates the reference's train transform pipeline
(``Person-ReID/train_encodersKIT.py:313-320``):

    Resize(bicubic) → RandomCrop(pad=10) → RandomHorizontalFlip(0.5)
    → ColorJitter(brightness=0.4, contrast=0.3, saturation=0.4, hue=0)
    → ToTensor → RandomErasing(p=1.0, scale=(0.05, 0.30)) → Normalize

Resize happens on the host (bicubic, see ``preprocess.decode_resize``);
everything after runs here as vectorized VPU ops over the whole uint8 batch
with explicit PRNG keys — no per-image Python, no worker processes.

Deviations from torchvision (documented, training-stochastic only):
- ColorJitter applies brightness→contrast→saturation in fixed order instead
  of a random permutation (same marginal distributions).
- RandomErasing samples one (area, aspect) proposal and clamps it into
  bounds instead of rejection-sampling up to 10 attempts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from daliid_tpu.augment.preprocess import IMAGENET_MEAN, IMAGENET_STD

# ITU-R 601 luma weights (torchvision's rgb_to_grayscale). Kept as a plain
# tuple: a module-scope jnp array would initialize the XLA backend at
# import time, which breaks jax.distributed.initialize (must run first).
_GRAY = (0.299, 0.587, 0.114)


def _random_crop(img: jnp.ndarray, key: jax.Array, pad: int) -> jnp.ndarray:
    """Zero-pad by ``pad`` then crop back to the original size at a random
    offset (torchvision RandomCrop(padding=pad) semantics, constant fill 0)."""
    h, w, _ = img.shape
    padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (), 0, 2 * pad + 1)
    ox = jax.random.randint(kx, (), 0, 2 * pad + 1)
    return jax.lax.dynamic_slice(padded, (oy, ox, 0), (h, w, 3))


def _color_jitter(img: jnp.ndarray, key: jax.Array, brightness, contrast, saturation) -> jnp.ndarray:
    """Brightness/contrast/saturation jitter on a float image in [0, 1]."""
    kb, kc, ks = jax.random.split(key, 3)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)

    img = jnp.clip(img * fb, 0.0, 1.0)
    gray = jnp.tensordot(img, jnp.asarray(_GRAY), axes=([-1], [0]))
    mean_gray = jnp.mean(gray)
    img = jnp.clip(mean_gray + fc * (img - mean_gray), 0.0, 1.0)
    img = jnp.clip(gray[..., None] + fs * (img - gray[..., None]), 0.0, 1.0)
    return img


def _random_erase(img: jnp.ndarray, key: jax.Array, scale, ratio) -> jnp.ndarray:
    """Erase one random rectangle to 0 (RandomErasing p=1.0, value=0 — the
    reference always erases, ``train_encodersKIT.py:319``)."""
    h, w, _ = img.shape
    ka, kr, ky, kx = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1]) * h * w
    log_ratio = jax.random.uniform(kr, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(area * aspect).astype(jnp.int32), 1, h)
    ew = jnp.clip(jnp.sqrt(area / aspect).astype(jnp.int32), 1, w)
    oy = jax.random.randint(ky, (), 0, h)  # clamp-into-bounds below
    ox = jax.random.randint(kx, (), 0, w)
    oy = jnp.minimum(oy, h - eh)
    ox = jnp.minimum(ox, w - ew)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inside = (rows >= oy) & (rows < oy + eh) & (cols >= ox) & (cols < ox + ew)
    return jnp.where(inside[..., None], 0.0, img)


def _augment_one(
    img_u8: jnp.ndarray,
    key: jax.Array,
    pad: int,
    brightness: float,
    contrast: float,
    saturation: float,
    erase_scale,
    erase_ratio,
    mean,
    std,
) -> jnp.ndarray:
    k_crop, k_flip, k_jit, k_erase = jax.random.split(key, 4)
    img = _random_crop(img_u8, k_crop, pad)
    flip = jax.random.bernoulli(k_flip)
    img = jnp.where(flip, img[:, ::-1, :], img)
    img = img.astype(jnp.float32) / 255.0
    img = _color_jitter(img, k_jit, brightness, contrast, saturation)
    img = _random_erase(img, k_erase, erase_scale, erase_ratio)
    return (img - mean) / std


@functools.partial(
    jax.jit,
    static_argnames=("pad", "brightness", "contrast", "saturation", "erase_scale", "erase_ratio", "dtype"),
)
def train_augment_batch(
    images_u8: jnp.ndarray,  # (B, H, W, 3) uint8, already bicubic-resized
    key: jax.Array,
    pad: int = 10,
    brightness: float = 0.4,
    contrast: float = 0.3,
    saturation: float = 0.4,
    erase_scale: tuple = (0.05, 0.30),
    erase_ratio: tuple = (0.3, 3.3),
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Augment + normalize a uint8 batch → (B, H, W, 3) in compute dtype.

    Defaults mirror ``train_encodersKIT.py:313-320`` exactly (ColorJitter
    0.4/0.3/0.4/0, RandomCrop pad 10, RandomErasing p=1 scale 0.05-0.30).
    """
    keys = jax.random.split(key, images_u8.shape[0])
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    out = jax.vmap(
        lambda im, k: _augment_one(
            im, k, pad, brightness, contrast, saturation, erase_scale, erase_ratio, mean, std
        )
    )(images_u8, keys)
    return out.astype(dtype)
