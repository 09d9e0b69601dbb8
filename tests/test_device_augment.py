"""On-device augmentation vs host-side oracles."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object, hflip_annotation
from structuredetector_tpu.data.pipeline import flatten_annotation
from structuredetector_tpu.ops.device_augment import (
    color_jitter,
    device_augment,
    hsv_to_rgb,
    normalize_images,
    random_flips,
    rgb_to_hsv,
)


pytestmark = pytest.mark.slow  # jit-compiles augmented steps


def test_hsv_roundtrip(rng):
    rgb = rng.random((50, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_rgb_to_hsv_matches_colorsys(rng):
    rgb = rng.random((20, 3)).astype(np.float64)
    got = np.asarray(rgb_to_hsv(jnp.asarray(rgb, jnp.float32)))
    for i in range(20):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(got[i], [h, s, v], atol=1e-5)


def test_color_jitter_identity_when_disabled(rng):
    img = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    out = color_jitter(img, jax.random.PRNGKey(0), brightness=0, contrast=0,
                       saturation=0, hue=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_color_jitter_stays_in_range(rng):
    img = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    out = np.asarray(color_jitter(img, jax.random.PRNGKey(3)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # different key -> different result
    out2 = np.asarray(color_jitter(img, jax.random.PRNGKey(4)))
    assert not np.allclose(out, out2)


def test_brightness_semantics(rng):
    """brightness-only jitter is img * f for some f in [0.75, 1.25]."""
    img = jnp.asarray(rng.random((1, 8, 8, 3)) * 0.5, jnp.float32)
    out = np.asarray(color_jitter(img, jax.random.PRNGKey(0),
                                  contrast=0, saturation=0, hue=0))
    ratio = out / np.asarray(img)
    f = ratio.mean()
    assert 0.75 <= f <= 1.25
    np.testing.assert_allclose(ratio, f, rtol=1e-4)


def _kp_dict(ann, in_size, out_size):
    flat = flatten_annotation(
        ann, labels={"bean": 0}, parts={"leaf": 0}, max_objects=4, max_parts=8,
        in_size=in_size, out_size=out_size,
    )
    return {f: jnp.asarray(getattr(flat, f))[None] for f in flat._fields}


def test_random_flips_match_host_semantics(rng):
    """Device grid-space mirror == host hflip_annotation then flatten."""
    in_w = in_h = 64
    out_w = out_h = 16
    ann = ImageAnnotation("x.jpg", [
        Object("bean", Keypoint("stem", 10.0, 20.0),
               [Keypoint("leaf", 30.0, 40.0)])
    ], (in_w, in_h))
    kp = _kp_dict(ann.resized((in_w, in_h), (in_w, in_h)), (in_w, in_h), (out_w, out_h))
    img = jnp.asarray(rng.random((1, in_h, in_w, 3)), jnp.float32)

    # force hflip only: find a key where do_h and not do_v
    for seed in range(50):
        key = jax.random.PRNGKey(seed)
        kx, ky = jax.random.split(key)
        if (jax.random.uniform(kx, (1,)) < 0.5)[0] and not (jax.random.uniform(ky, (1,)) < 0.5)[0]:
            break
    else:
        pytest.fail("no suitable key")

    out_img, out_kp = random_flips(img, kp, key, out_w=out_w, out_h=out_h)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img)[:, :, ::-1], atol=1e-6)

    want_ann = hflip_annotation(
        ImageAnnotation("x.jpg", [
            Object("bean", Keypoint("stem", 10.0, 20.0), [Keypoint("leaf", 30.0, 40.0)])
        ], (in_w, in_h)),
        (in_w, in_h),
    )
    want = _kp_dict(want_ann, (in_w, in_h), (out_w, out_h))
    np.testing.assert_allclose(
        np.asarray(out_kp["anchors_xy"][0, 0]), np.asarray(want["anchors_xy"][0, 0]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_kp["parts_xy"][0, 0]), np.asarray(want["parts_xy"][0, 0]),
        atol=1e-5,
    )
    # owner coords mirror with everything else, so the embedding target
    # (owner - part) flips sign on x — the property the embedding head
    # trains against (see DESIGN.md "Structural grouping")
    np.testing.assert_allclose(
        np.asarray(out_kp["part_owner_xy"][0, 0]),
        np.asarray(want["part_owner_xy"][0, 0]), atol=1e-5,
    )
    emb_before = np.asarray(kp["part_owner_xy"][0, 0]) - np.asarray(kp["parts_xy"][0, 0])
    emb_after = np.asarray(out_kp["part_owner_xy"][0, 0]) - np.asarray(out_kp["parts_xy"][0, 0])
    np.testing.assert_allclose(emb_after, emb_before * np.array([-1.0, 1.0]), atol=1e-5)


def test_device_augment_end_to_end(rng):
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    ann = ImageAnnotation("x.jpg", [
        Object("bean", Keypoint("stem", 5.0, 6.0), [Keypoint("leaf", 10.0, 12.0)])
    ], (32, 32))
    kp1 = _kp_dict(ann, (32, 32), (8, 8))
    kp = {k: jnp.concatenate([v, v]) for k, v in kp1.items()}

    out, out_kp = jax.jit(
        lambda i, k, key: device_augment(i, k, key, out_w=8, out_h=8)
    )(img, kp, jax.random.PRNGKey(1))
    assert out.shape == img.shape
    # normalized output: mean roughly (x - mean)/std range
    assert np.asarray(out).min() < 0  # normalization applied
    # keypoints stay inside the grid
    axy = np.asarray(out_kp["anchors_xy"])
    mask = np.asarray(out_kp["anchor_mask"])
    assert (axy[mask] >= 0).all() and (axy[mask] <= 8).all()


def test_normalize_images():
    img = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.asarray(normalize_images(img))
    want = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_marker_pixel_alignment(rng):
    """End-to-end geometric consistency: a bright marker pixel placed at
    the keypoint location must still sit at the keypoint's (transformed)
    location after device augmentation, for every flip combination."""
    B, H, W, g = 8, 64, 64, 16
    imgs = np.zeros((B, H, W, 3), np.float32)
    kx, ky = 20, 44
    imgs[:, ky, kx, 0] = 1.0
    kp = {
        "anchors_xy": jnp.tile(jnp.array([[[kx * g / W, ky * g / H]]]), (B, 1, 1)),
        "anchor_cls": jnp.zeros((B, 1), jnp.int32),
        "anchor_mask": jnp.ones((B, 1), bool),
        "parts_xy": jnp.zeros((B, 1, 2)),
        "part_kind": jnp.zeros((B, 1), jnp.int32),
        "part_owner_xy": jnp.zeros((B, 1, 2)),
        "part_mask": jnp.zeros((B, 1), bool),
    }
    out, okp = device_augment(
        jnp.asarray(imgs), kp, jax.random.PRNGKey(42), out_w=g, out_h=g
    )
    out = np.asarray(out)
    axy = np.asarray(okp["anchors_xy"])
    for b in range(B):
        my, mx = np.unravel_index(out[b, :, :, 0].argmax(), (H, W))
        ex, ey = axy[b, 0, 0] * W / g, axy[b, 0, 1] * H / g
        assert abs(ex - mx) < 1.5 and abs(ey - my) < 1.5, (b, (mx, my), (ex, ey))
