"""Unit tests for core device ops vs naive numpy references.

The numpy oracles re-derive the *documented semantics* of the reference
helpers (SURVEY.md #24: 5x5 plateau NMS, two-stage top-k with class id =
flat_index // k, clamp to [1e-6, 1-1e-6]).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.tensor import (
    clamped_sigmoid,
    gather_features,
    gaussian_heatmap_max,
    plateau_nms,
    topk_per_class,
)


def naive_plateau_nms(hm: np.ndarray, window=5) -> np.ndarray:
    """hm: (B, H, W, C)."""
    b, h, w, c = hm.shape
    pad = window // 2
    out = np.zeros_like(hm)
    padded = np.full((b, h + 2 * pad, w + 2 * pad, c), -np.inf)
    padded[:, pad : pad + h, pad : pad + w, :] = hm
    for y in range(h):
        for x in range(w):
            win = padded[:, y : y + window, x : x + window, :]
            mx = win.max(axis=(1, 2))
            keep = hm[:, y, x, :] == mx
            out[:, y, x, :] = np.where(keep, hm[:, y, x, :], 0.0)
    return out


def test_clamped_sigmoid_bounds():
    x = jnp.array([-100.0, 0.0, 100.0])
    y = np.asarray(clamped_sigmoid(x))
    assert y[0] == pytest.approx(1e-6)
    assert y[1] == pytest.approx(0.5)
    assert y[2] == pytest.approx(1 - 1e-6)


def test_plateau_nms_matches_naive(rng):
    hm = rng.random((2, 12, 10, 3)).astype(np.float32)
    got = np.asarray(plateau_nms(jnp.asarray(hm)))
    want = naive_plateau_nms(hm)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_plateau_nms_keeps_plateaus():
    """Equal-valued plateau pixels are all kept (== comparison)."""
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = hm[0, 3, 4, 0] = 0.7
    got = np.asarray(plateau_nms(jnp.asarray(hm)))
    assert got[0, 3, 3, 0] == 0.7 and got[0, 3, 4, 0] == 0.7


def test_topk_semantics(rng):
    """Class id is recovered as flat_index // k (reference utils.py:460)."""
    b, h, w, c, k = 2, 9, 7, 3, 5
    scores = rng.random((b, h, w, c)).astype(np.float32)
    s, inds, cls, ys, xs = (np.asarray(t) for t in topk_per_class(jnp.asarray(scores), k))

    # oracle: per-class topk over H*W, then global topk over C*k
    per_class = np.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    pc_idx = np.argsort(-per_class, axis=-1)[:, :, :k]
    pc_scores = np.take_along_axis(per_class, pc_idx, axis=-1)
    flat = pc_scores.reshape(b, c * k)
    g_idx = np.argsort(-flat, axis=-1)[:, :k]
    want_scores = np.take_along_axis(flat, g_idx, axis=-1)
    want_cls = g_idx // k
    want_inds = np.take_along_axis(pc_idx.reshape(b, c * k), g_idx, axis=-1)

    np.testing.assert_allclose(s, want_scores, rtol=1e-6)
    np.testing.assert_array_equal(cls.astype(int), want_cls)
    np.testing.assert_array_equal(inds.astype(int), want_inds)
    np.testing.assert_array_equal(ys.astype(int), want_inds // w)
    np.testing.assert_array_equal(xs.astype(int), want_inds % w)


def test_gather_features(rng):
    b, h, w, c, n = 2, 6, 5, 4, 3
    feat = rng.random((b, h, w, c)).astype(np.float32)
    inds = rng.integers(0, h * w, size=(b, n))
    got = np.asarray(gather_features(jnp.asarray(feat), jnp.asarray(inds)))
    for bi in range(b):
        for ni in range(n):
            y, x = divmod(int(inds[bi, ni]), w)
            np.testing.assert_allclose(got[bi, ni], feat[bi, y, x], rtol=1e-6)


def test_gaussian_heatmap_max_matches_reference_formula(rng):
    """Matches the dense per-keypoint splat with per-pixel max merge
    (transforms.py:160-161, gaussian_2d utils.py:418-419)."""
    b, h, w, c, k = 2, 16, 12, 2, 5
    sigma = 1.7
    cx = rng.integers(0, w, (b, k)).astype(np.float64)
    cy = rng.integers(0, h, (b, k)).astype(np.float64)
    cls = rng.integers(0, c, (b, k))
    mask = rng.random((b, k)) > 0.3

    got = np.asarray(
        gaussian_heatmap_max(
            jnp.zeros((b, h, w, c), jnp.float32),
            jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cls), jnp.asarray(mask),
            sigma, c,
        )
    )

    want = np.zeros((b, h, w, c), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for bi in range(b):
        for ki in range(k):
            if not mask[bi, ki]:
                continue
            g = np.exp(-((xs - cx[bi, ki]) ** 2 + (ys - cy[bi, ki]) ** 2) / (2 * sigma**2))
            ch = int(cls[bi, ki])
            want[bi, :, :, ch] = np.maximum(want[bi, :, :, ch], g)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ops_are_jittable():
    f = jax.jit(lambda x: topk_per_class(plateau_nms(clamped_sigmoid(x)), 4))
    out = f(jnp.zeros((1, 8, 8, 2)))
    assert out[0].shape == (1, 4)


def test_topk_iterative_exact(rng):
    """The iterative masked-argmax top-k must match `lax.top_k` exactly
    — values AND indices, including tie order (ascending index among
    equal values) — across plane sizes, including the 16K 512x512-grid
    plane the decode path uses."""
    from structuredetector_tpu.ops.tensor import _topk_iterative
    import jax.numpy as jnp
    from jax import lax

    for n, k in ((63, 7), (2048, 20), (16384, 40), (15360, 40)):
        x = rng.random((2, 3, n)).astype(np.float32)
        want_v, want_i = lax.top_k(jnp.asarray(x), k)
        got_v, got_i = _topk_iterative(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    # tie-heavy: few distinct values so tie order is exercised hard
    x = (rng.integers(0, 4, size=(2, 2, 2048)) / 4.0).astype(np.float32)
    want_v, want_i = lax.top_k(jnp.asarray(x), 30)
    got_v, got_i = _topk_iterative(jnp.asarray(x), 30)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
