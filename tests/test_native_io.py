"""Native C++ IO library vs the PIL path. Skipped if not built."""

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.data import native
from structuredetector_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native/libsdnet_io.so not built"
)


def _pil_reference(path, out_w, out_h):
    img = Image.open(path).convert("RGB").resize((out_w, out_h), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def smooth_image(h, w):
    """Smooth gradient image (noise images make scaled-DCT decode vs
    full-decode-then-resize legitimately diverge)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 128 + 100 * np.sin(x / w * 3.1)
    g = 128 + 100 * np.cos(y / h * 2.7)
    b = (x + y) / (w + h) * 255
    return np.stack([r, g, b], -1).clip(0, 255).astype(np.uint8)


@pytest.fixture
def jpeg_file(tmp_path):
    p = tmp_path / "img.jpg"
    Image.fromarray(smooth_image(96, 128)).save(p, quality=95)
    return p


@pytest.fixture
def png_file(tmp_path, rng):
    arr = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    return p


def test_load_image_jpeg_close_to_pil(jpeg_file):
    out, orig = native.load_image(jpeg_file, 64, 48)
    assert out.shape == (48, 64, 3)
    assert orig == (128, 96)
    want = _pil_reference(jpeg_file, 64, 48)
    # decode + bilinear differences are small in normalized units
    assert np.abs(out - want).mean() < 0.08


def test_load_image_jpeg_full_size_matches_pil_decode(jpeg_file):
    """At the native size no DCT scaling or resampling happens — decode
    must match PIL's libjpeg output almost exactly."""
    out, _ = native.load_image(jpeg_file, 128, 96)
    want = _pil_reference(jpeg_file, 128, 96)
    assert np.abs(out - want).mean() < 5e-3


def test_load_image_png_exact_decode(png_file):
    out, orig = native.load_image(png_file, 70, 50)  # same size: no resample
    assert orig == (70, 50)
    want = _pil_reference(png_file, 70, 50)
    np.testing.assert_allclose(out, want, atol=2e-2)


def test_load_image_hflip(png_file):
    plain, _ = native.load_image(png_file, 70, 50)
    flipped, _ = native.load_image(png_file, 70, 50, hflip=True)
    np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-5)


def test_load_image_vflip(png_file):
    plain, _ = native.load_image(png_file, 70, 50)
    flipped, _ = native.load_image(png_file, 70, 50, vflip=True)
    np.testing.assert_allclose(flipped, plain[::-1], atol=1e-5)


def test_load_batch(tmp_path, rng):
    paths = []
    for i in range(5):
        arr = (rng.random((40 + i, 60, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"b{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(p)
    paths.append(tmp_path / "missing.jpg")

    out, orig, ok = native.load_batch(paths, 32, 32, n_threads=3)
    assert out.shape == (6, 32, 32, 3)
    assert ok[:5].all() and not ok[5]
    assert tuple(orig[0]) == (60, 40)
    # each decoded image matches the single-image path
    single, _ = native.load_image(paths[2], 32, 32)
    np.testing.assert_allclose(out[2], single, atol=1e-6)


def test_jpeg_scaled_decode_large(tmp_path, rng):
    """Large image exercises the DCT-space scaled decode path."""
    arr = smooth_image(1024, 1536)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, quality=90)
    out, orig = native.load_image(p, 128, 128)
    assert orig == (1536, 1024)
    want = _pil_reference(p, 128, 128)
    assert np.abs(out - want).mean() < 0.12  # noise image: resampling differs


def test_load_image_raw01(png_file):
    out, _ = native.load_image(png_file, 70, 50, normalize=False)
    assert out.min() >= 0.0 and out.max() <= 1.0
    normed, _ = native.load_image(png_file, 70, 50, normalize=True)
    want = (out - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(normed, want, atol=1e-5)
