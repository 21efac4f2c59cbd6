"""Preprocessing and train-augmentation: determinism, ranges, semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daliid_tpu.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_resize,
    normalize_images,
    train_augment_batch,
)


def test_normalize_matches_torchvision_formula(rng):
    img = rng.integers(0, 256, size=(2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    expected = (img.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_decode_resize_shape(tmp_path, rng):
    from PIL import Image

    p = tmp_path / "x.jpg"
    Image.fromarray(rng.integers(0, 255, size=(37, 23, 3)).astype(np.uint8)).save(p)
    out = decode_resize(str(p), 64, 32)
    assert out.shape == (64, 32, 3) and out.dtype == np.uint8


def test_train_augment_shapes_and_determinism(rng):
    imgs = rng.integers(0, 256, size=(4, 32, 16, 3)).astype(np.uint8)
    key = jax.random.key(7)
    a = np.asarray(train_augment_batch(jnp.asarray(imgs), key))
    b = np.asarray(train_augment_batch(jnp.asarray(imgs), key))
    c = np.asarray(train_augment_batch(jnp.asarray(imgs), jax.random.key(8)))
    assert a.shape == (4, 32, 16, 3)
    np.testing.assert_array_equal(a, b)  # same key → identical batch
    assert not np.allclose(a, c)         # different key → different batch


def test_train_augment_erases_region(rng):
    # RandomErasing p=1.0 → every image must contain an erased (==normalized 0)
    # rectangle of at least 5% of the area.
    imgs = np.full((2, 40, 20, 3), 200, dtype=np.uint8)
    out = np.asarray(train_augment_batch(jnp.asarray(imgs), jax.random.key(3)))
    norm_zero = (0.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    for i in range(2):
        erased = np.all(np.isclose(out[i], norm_zero, atol=1e-4), axis=-1)
        assert erased.mean() >= 0.04  # ≥ ~5% of pixels erased (minus crop overlap)


def test_train_augment_values_in_valid_range(rng):
    imgs = rng.integers(0, 256, size=(3, 32, 16, 3)).astype(np.uint8)
    out = np.asarray(train_augment_batch(jnp.asarray(imgs), jax.random.key(0)))
    lo = (0.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    hi = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    assert np.all(out >= lo - 1e-4) and np.all(out <= hi + 1e-4)
