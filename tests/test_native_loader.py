"""Native C++ JPEG loader: PIL parity, errors, throughput sanity."""

import time

import numpy as np
import pytest
from PIL import Image

from daliid_tpu.augment.preprocess import decode_resize
from daliid_tpu.data.native_loader import decode_resize_batch, native_loader_available

pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="native loader could not build"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(64, 48), (128, 64), (37, 23), (256, 128)]):
        # smooth content (JPEG-friendly) so decode differences stay tiny
        y = np.linspace(0, 255, h)[:, None, None]
        x = np.linspace(0, 255, w)[None, :, None]
        c = np.linspace(0, 255, 3)[None, None, :]
        img = ((y + x + c) / 3 + rng.normal(0, 4, (h, w, 3))).clip(0, 255).astype(np.uint8)
        p = d / f"img{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_matches_pil_closely(jpegs):
    H, W = 64, 32
    native = decode_resize_batch(jpegs, H, W)
    pil = np.stack([decode_resize(p, H, W) for p in jpegs])
    assert native.shape == pil.shape == (len(jpegs), H, W, 3)
    diff = np.abs(native.astype(np.int32) - pil.astype(np.int32))
    assert diff.mean() < 1.5, f"mean abs diff {diff.mean():.2f}"
    assert np.percentile(diff, 99) <= 6


def test_no_resize_is_exact(jpegs):
    # identical decode when no resampling happens (same libjpeg under PIL)
    p = jpegs[3]  # 256x128 source
    native = decode_resize_batch([p], 256, 128)[0]
    pil = decode_resize(p, 256, 128)
    np.testing.assert_array_equal(native, pil)


def test_missing_file_raises(jpegs):
    with pytest.raises(FileNotFoundError):
        decode_resize_batch([jpegs[0], "/nonexistent.jpg"], 32, 16)


def test_corrupt_file_raises(tmp_path, jpegs):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_resize_batch([str(bad)], 32, 16)


def test_many_images_threaded(jpegs):
    paths = jpegs * 32  # 128 images
    t0 = time.time()
    out = decode_resize_batch(paths, 64, 32, num_threads=8)
    dt = time.time() - t0
    assert out.shape == (128, 64, 32, 3)
    assert dt < 10.0
