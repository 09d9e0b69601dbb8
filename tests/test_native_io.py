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


def test_fast_mode_jpeg_close_to_pil(jpeg_file):
    out, orig = native.load_image(jpeg_file, 64, 48, exact=False)
    assert out.shape == (48, 64, 3)
    assert orig == (128, 96)
    want = _pil_reference(jpeg_file, 64, 48)
    # decode + bilinear differences are small in normalized units
    assert np.abs(out - want).mean() < 0.08


@pytest.mark.parametrize("size", [(64, 48), (128, 96), (200, 150), (30, 77)])
def test_exact_mode_jpeg_bit_identical(jpeg_file, size):
    """Default (exact) mode is bit-identical to the PIL host path:
    full decode + Pillow-semantics resample + identical float ops."""
    out, _ = native.load_image(jpeg_file, *size)
    want = _pil_reference(jpeg_file, *size)
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("size", [(70, 50), (32, 32), (140, 100), (65, 49)])
def test_exact_mode_png_bit_identical(png_file, size):
    out, _ = native.load_image(png_file, *size)
    want = _pil_reference(png_file, *size)
    np.testing.assert_array_equal(out, want)


def test_exact_mode_raw01_bit_identical(png_file):
    from PIL import Image as PILImage

    out, _ = native.load_image(png_file, 33, 21, normalize=False)
    img = PILImage.open(png_file).convert("RGB").resize((33, 21), PILImage.BILINEAR)
    want = np.asarray(img, np.float32) / 255.0
    np.testing.assert_array_equal(out, want)


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


@pytest.mark.slow  # 1 MP encode+decode, ~5 s on this host
def test_jpeg_scaled_decode_large(tmp_path, rng):
    """Large image exercises the DCT-space scaled decode path."""
    arr = smooth_image(1024, 1536)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, quality=90)
    out, orig = native.load_image(p, 128, 128, exact=False)
    assert orig == (1536, 1024)
    want = _pil_reference(p, 128, 128)
    assert np.abs(out - want).mean() < 0.12  # noise image: resampling differs


def test_load_image_raw01(png_file):
    out, _ = native.load_image(png_file, 70, 50, normalize=False)
    assert out.min() >= 0.0 and out.max() <= 1.0
    normed, _ = native.load_image(png_file, 70, 50, normalize=True)
    want = (out - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(normed, want, atol=1e-5)


def test_load_batch_raw01(tmp_path, rng):
    arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    p = tmp_path / "raw.png"
    Image.fromarray(arr).save(p)
    out, _, ok = native.load_batch([p, p], 60, 40, normalize=False)
    assert ok.all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    single, _ = native.load_image(p, 60, 40, normalize=False)
    np.testing.assert_allclose(out[0], single, atol=1e-6)


def _write_dataset(tmp_path, rng, n=5):
    import json

    for i in range(n):
        w, h = 64 + 4 * i, 48 + 4 * i
        arr = smooth_image(h, w)  # noise diverges under different resamplers
        img = tmp_path / f"s{i}.png"
        Image.fromarray(arr).save(img)
        objs = [{
            "label": "bean", "box": None,
            "parts": [
                {"kind": "stem", "location": {"x": w / 3, "y": h / 3}, "score": None},
                {"kind": "leaf", "location": {"x": w / 2, "y": h / 2}, "score": None},
            ],
        }]
        (tmp_path / f"s{i}.json").write_text(json.dumps({
            "image_path": str(img), "img_size": [w, h], "objects": objs}))
    return tmp_path


def test_native_batch_loader_matches_pil_path(tmp_path, rng):
    """The whole-batch native loader must produce the same keypoints /
    annotations as the per-sample PIL path, and near-identical pixels
    (PNG at unchanged... rather resized: bilinear kernels differ slightly)."""
    from structuredetector_tpu.config import Config
    from structuredetector_tpu.data.augment import ValidationAugmentation
    from structuredetector_tpu.data.dataset import CropDataset
    from structuredetector_tpu.data.pipeline import Loader, native_batch_fetch

    _write_dataset(tmp_path, rng)
    cfg = Config(width=32, height=32, max_objects=4, max_parts=8)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"

    aug = ValidationAugmentation(cfg)
    ds = CropDataset(cfg, tmp_path, aug)
    pil_batches = list(Loader(ds, batch_size=2))
    nat_batches = list(
        Loader(ds, batch_size=2, batch_fetch=native_batch_fetch(ds, aug, n_threads=2))
    )

    assert len(pil_batches) == len(nat_batches)
    for pb, nb in zip(pil_batches, nat_batches):
        assert pb["image"].shape == nb["image"].shape
        assert np.abs(pb["image"] - nb["image"]).mean() < 0.15
        for f in pb["keypoints"]._fields:
            np.testing.assert_allclose(
                getattr(pb["keypoints"], f), getattr(nb["keypoints"], f), atol=1e-5
            )
        for pa, na in zip(pb["annotation"], nb["annotation"]):
            assert pa.img_size == na.img_size
            assert len(pa.objects) == len(na.objects)


def test_choose_batch_fetch_gating(tmp_path, rng):
    from structuredetector_tpu.config import Config
    from structuredetector_tpu.data.augment import (
        TrainAugmentation,
        ValidationAugmentation,
    )
    from structuredetector_tpu.data.dataset import CropDataset
    from structuredetector_tpu.data.pipeline import choose_batch_fetch

    _write_dataset(tmp_path, rng, n=2)
    cfg = Config(width=32, height=32, native_io=True)
    cfg.set_labels(["bean"], ["leaf"])
    cfg.anchor_name = "stem"

    val = ValidationAugmentation(cfg)
    ds = CropDataset(cfg, tmp_path, val)
    assert choose_batch_fetch(cfg, ds, val) is not None

    # host-side PIL augmentation cannot use the whole-batch loader
    cfg_host = Config(width=32, height=32, native_io=True, device_augment=False)
    cfg_host.set_labels(["bean"], ["leaf"])
    train_host = TrainAugmentation(cfg_host)
    assert choose_batch_fetch(cfg_host, ds, train_host) is None

    # device-augment training path can
    train_dev = TrainAugmentation(cfg)
    assert choose_batch_fetch(cfg, ds, train_dev) is not None

    # native_io off -> no native path
    cfg_off = Config(width=32, height=32, native_io=False)
    cfg_off.set_labels(["bean"], ["leaf"])
    assert choose_batch_fetch(cfg_off, ds, val) is None


def test_load_image_u8_exact_matches_raw01(png_file):
    """uint8 feed: raw resized pixels; u8/255 in f32 must reproduce the
    float raw01 output bit-for-bit (exact mode shares the uint8
    resample intermediate)."""
    u8, size_u8 = native.load_image(png_file, 70, 50, normalize=False,
                                    dtype=np.uint8)
    f32, size_f = native.load_image(png_file, 70, 50, normalize=False)
    assert u8.dtype == np.uint8
    assert size_u8 == size_f
    np.testing.assert_array_equal(u8.astype(np.float32) / 255.0, f32)


def test_load_image_u8_matches_pil_pixels(png_file):
    """Exact-mode uint8 output == PIL's resized uint8 pixels."""
    u8, _ = native.load_image(png_file, 33, 21, normalize=False,
                              dtype=np.uint8)
    pil = Image.open(png_file).convert("RGB").resize((33, 21), Image.BILINEAR)
    np.testing.assert_array_equal(u8, np.asarray(pil, np.uint8))


def test_load_image_u8_flips(png_file):
    base, _ = native.load_image(png_file, 24, 18, normalize=False,
                                dtype=np.uint8)
    hf, _ = native.load_image(png_file, 24, 18, hflip=True,
                              normalize=False, dtype=np.uint8)
    vf, _ = native.load_image(png_file, 24, 18, vflip=True,
                              normalize=False, dtype=np.uint8)
    np.testing.assert_array_equal(hf, base[:, ::-1])
    np.testing.assert_array_equal(vf, base[::-1])


def test_load_batch_u8_matches_float(tmp_path, rng):
    arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    u8, orig_u8, ok_u8 = native.load_batch(
        [p, p], 48, 32, normalize=False, dtype=np.uint8)
    f32, orig_f, ok_f = native.load_batch([p, p], 48, 32, normalize=False)
    assert ok_u8.all() and ok_f.all()
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(orig_u8, orig_f)
    np.testing.assert_array_equal(u8.astype(np.float32) / 255.0, f32)


def test_load_image_u8_fast_mode_close_to_float(jpeg_file):
    """Fast mode rounds the bilinear result to uint8 — within half a
    pixel level of the float fast path."""
    u8, _ = native.load_image(jpeg_file, 64, 48, normalize=False,
                              exact=False, dtype=np.uint8)
    f32, _ = native.load_image(jpeg_file, 64, 48, normalize=False,
                               exact=False)
    err = np.abs(u8.astype(np.float32) / 255.0 - f32).max()
    assert err <= 0.5 / 255 + 1e-6


def test_decode_bytes_jpeg_matches_load_image(jpeg_file):
    """In-memory decode (serving path) == file decode, exact mode."""
    data = jpeg_file.read_bytes()
    mem, size_mem = native.decode_bytes(data, 64, 48)
    file, size_file = native.load_image(jpeg_file, 64, 48)
    assert size_mem == size_file == (128, 96)
    np.testing.assert_array_equal(mem, file)


def test_decode_bytes_png_u8_matches_pil(png_file):
    data = png_file.read_bytes()
    mem, size = native.decode_bytes(data, 32, 24, normalize=False,
                                    dtype=np.uint8)
    assert size == (70, 50)
    pil = np.asarray(
        Image.open(png_file).convert("RGB").resize((32, 24), Image.BILINEAR)
    )
    np.testing.assert_array_equal(mem, pil)


def test_decode_bytes_rejects_garbage():
    with pytest.raises(IOError):
        native.decode_bytes(b"not an image at all", 32, 32)
    with pytest.raises(IOError):
        # truncated JPEG: valid SOI marker, nothing else
        native.decode_bytes(b"\xff\xd8\xff\xe0trunc", 32, 32)


def test_decode_bytes_rejects_mid_scan_truncation(jpeg_file):
    """A JPEG cut off mid-scan is 'decoded' by libjpeg via a faked EOI
    marker plus a *warning* (not an error), yielding a half-gray image.
    PIL raises on the same bytes; the serving path guarantees 400. The
    native decoder must fail it, not serve garbage detections."""
    data = jpeg_file.read_bytes()
    cut = data[: int(len(data) * 0.6)]  # past header, mid scan data
    with pytest.raises(IOError):
        native.decode_bytes(cut, 32, 32)
    # and the file-based loader must reject the same truncation
    trunc = jpeg_file.parent / "trunc.jpg"
    trunc.write_bytes(cut)
    with pytest.raises(IOError):
        native.load_image(trunc, 32, 32)


def test_decode_bytes_tolerates_benign_corrupt_data_warning(jpeg_file):
    """Only TRUNCATION (JWRN_JPEG_EOF) may fail a decode. Other
    corrupt-data warnings — here 'extraneous bytes before marker 0xd9',
    common in camera output with trailing garbage — decode fully in PIL
    and must decode here too, byte-identically to the clean stream."""
    data = jpeg_file.read_bytes()
    assert data[-2:] == b"\xff\xd9"
    noisy = data[:-2] + b"\x00garbage\x00" + data[-2:]
    clean, size_clean = native.decode_bytes(data, 32, 32)
    out, size = native.decode_bytes(noisy, 32, 32)
    assert size == size_clean
    np.testing.assert_array_equal(out, clean)
    # and via the file-based loader
    noisy_path = jpeg_file.parent / "noisy.jpg"
    noisy_path.write_bytes(noisy)
    out_f, _ = native.load_image(noisy_path, 32, 32)
    np.testing.assert_array_equal(out_f, clean)


def test_dataset_item_falls_back_to_pil_without_device_augment(tmp_path):
    """--native_io (default) + --no_augmentation must fall back to the
    PIL item path, not crash in TrainAugmentation.native_apply (which
    requires the device-augment feed). Regression: hasattr(native_apply)
    is always true for TrainAugmentation; the device_augment gate lives
    in CropDataset.__getitem__."""
    import json

    from structuredetector_tpu.config import Config
    from structuredetector_tpu.data import CropDataset, TrainAugmentation

    img = Image.fromarray(smooth_image(64, 64))
    img.save(tmp_path / "im.jpg")
    (tmp_path / "im.json").write_text(json.dumps({
        "image_path": str(tmp_path / "im.jpg"), "img_size": [64, 64],
        "objects": [{"label": "bean", "box": None, "parts": [
            {"kind": "stem", "location": {"x": 30, "y": 30}, "score": None},
        ]}],
    }))
    cfg = Config(width=64, height=64, no_augmentation=True, native_io=True,
                 max_objects=4, max_parts=8, use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    ds = CropDataset(cfg, tmp_path, TrainAugmentation(cfg))
    sample = ds[0]  # used to raise AttributeError
    assert sample["image"].shape == (64, 64, 3)
