"""Int8 inference mode (models/quantize.py): exactness on
quantization-transparent values, closeness on the full model, parameter
tree compatibility, and the training-path guard."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.network import build_model
from structuredetector_tpu.models.quantize import (
    Int8Conv,
    prequantize_variables,
    weight_qparams,
)


def test_weight_qparams_per_channel():
    k = np.zeros((1, 1, 2, 3), np.float32)
    k[0, 0, 0] = [127.0, 12.7, 0.0]  # per-channel amax: 127, 12.7, 0
    k[0, 0, 1] = [-64.0, 6.35, 0.0]
    q, scale = weight_qparams(jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(scale), [1.0, 0.1, 1.0 / 127.0])
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q)[0, 0, 0], [127, 127, 0])
    np.testing.assert_array_equal(np.asarray(q)[0, 0, 1], [-64, 64, 0])


def test_int8conv_exact_on_integer_grid():
    """Integer-valued weights/activations with amax=127 quantize at
    scale 1 exactly -> int8 conv == float conv bit-for-bit."""
    rng = np.random.default_rng(0)
    kernel = rng.integers(-127, 128, (3, 3, 8, 16)).astype(np.float32)
    kernel[0, 0, 0, :] = 127.0  # pin per-channel amax -> scale exactly 1
    x = rng.integers(-127, 128, (2, 10, 10, 8)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0
    bias = rng.normal(size=16).astype(np.float32)

    variables = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    m8 = Int8Conv(features=16, kernel_size=(3, 3), strides=1, padding=1,
                  use_bias=True, dtype=jnp.float32)
    mf = nn.Conv(16, (3, 3), strides=1, padding=1, use_bias=True,
                 dtype=jnp.float32)
    got = m8.apply(variables, jnp.asarray(x))
    want = mf.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8conv_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 4))
    v8 = Int8Conv(features=6, kernel_size=(3, 3), padding=1).init(
        jax.random.PRNGKey(0), x)
    vf = nn.Conv(6, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v8) == jax.tree_util.tree_structure(vf)
    for a, b in zip(jax.tree_util.tree_leaves(v8), jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape and a.dtype == b.dtype


def _tiny_config(**kw):
    cfg = Config(width=64, height=64, fpn_depth=32, max_objects=4, max_parts=8,
                 use_amp=False, **kw)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    return cfg


def test_int8_sdnet_tracks_float():
    """Full-model int8 output stays close to float: quantization noise
    must be small relative to the activation range, and heatmap peak
    locations must agree."""
    cfg = _tiny_config()
    model, variables = init_model(cfg)  # float init; same tree for both
    m8 = build_model(_tiny_config(int8=True))

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1
    want = model.apply(variables, x, train=False)
    got = m8.apply(variables, x, train=False)

    for k in want:
        w = np.asarray(want[k], np.float32)
        g = np.asarray(got[k], np.float32)
        rel = np.sqrt(np.mean((g - w) ** 2)) / (w.std() + 1e-8)
        assert rel < 0.25, (k, rel)
    # peak agreement on the anchor heatmap (what decode thresholds see)
    w_hm = np.asarray(want["anchor_hm"][0, ..., 0])
    g_hm = np.asarray(got["anchor_hm"][0, ..., 0])
    assert np.unravel_index(w_hm.argmax(), w_hm.shape) == np.unravel_index(
        g_hm.argmax(), g_hm.shape)


def test_prequantize_bit_identical_to_dynamic():
    """prequantize_variables stores int8 kernels + scales for exactly
    the int8-eligible convs (stem and head stay float) and the
    pre-quantized apply matches the dynamic path bit-for-bit."""
    cfg = _tiny_config(int8=True)
    m8 = build_model(cfg)
    _, variables = init_model(_tiny_config())
    pq = prequantize_variables(variables)

    p = pq["params"]
    assert p["encoder"]["conv1"]["kernel"].dtype == jnp.float32  # stem
    assert "kernel_scale" not in p["encoder"]["conv1"]
    assert p["head"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in p["head"]
    assert p["encoder"]["layer1_0"]["conv1"]["kernel"].dtype == jnp.int8
    assert p["up1"]["kernel"].dtype == jnp.int8
    assert p["up2"]["lateral"]["kernel_scale"].shape == (cfg.fpn_depth,)
    assert "batch_stats" in pq  # other collections preserved

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 2 - 1
    want = m8.apply(variables, x, train=False)
    got = m8.apply(pq, x, train=False)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_int8_training_rejected():
    cfg = _tiny_config(int8=True)
    model = build_model(cfg)
    _, variables = init_model(_tiny_config())
    with pytest.raises(ValueError, match="inference-only"):
        model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=True,
                    mutable=["batch_stats"])


def test_int8_dynamic_scales_isolate_batchmates():
    """Dynamic activation quantization is per-sample: a batchmate with a
    10x larger range must not change another sample's output (serving
    micro-batches mix unrelated requests)."""
    cfg = _tiny_config(int8=True)
    m8 = build_model(cfg)
    _, variables = init_model(_tiny_config())

    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3)) * 2 - 1
    loud = x * 10.0
    alone = m8.apply(variables, x, train=False)
    paired = m8.apply(variables, jnp.concatenate([x, loud]), train=False)
    for k in alone:
        np.testing.assert_array_equal(
            np.asarray(alone[k][0]), np.asarray(paired[k][0]), err_msg=k)


def test_calibrated_static_scales():
    """calibrate_activation_scales bakes act_scale params for exactly
    the int8 convs; serving on the (single-image) calibration batch is
    bit-identical to the dynamic path (same scales by construction —
    the dynamic path is per-sample, so only batch 1 pins this)."""
    from structuredetector_tpu.models.quantize import calibrate_activation_scales

    cfg = _tiny_config(int8=True)
    m8 = build_model(cfg)
    _, variables = init_model(_tiny_config())
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)) * 2 - 1

    cal = calibrate_activation_scales(m8, variables, [x])
    p = cal["params"]
    assert p["encoder"]["layer1_0"]["conv1"]["act_scale"].shape == ()
    assert p["up2"]["conv"]["act_scale"].shape == ()
    assert "act_scale" not in p["encoder"]["conv1"]  # stem stays float
    assert "act_scale" not in p["head"]

    want = m8.apply(variables, x, train=False)
    got = m8.apply(cal, x, train=False)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))

    # composes with prequantized int8 kernels
    from structuredetector_tpu.models.quantize import prequantize_variables

    got_pq = m8.apply(prequantize_variables(cal), x, train=False)
    np.testing.assert_array_equal(
        np.asarray(got_pq["anchor_hm"]), np.asarray(want["anchor_hm"]))


def test_calibration_requires_batches():
    from structuredetector_tpu.models.quantize import calibrate_activation_scales

    cfg = _tiny_config(int8=True)
    m8 = build_model(cfg)
    _, variables = init_model(_tiny_config())
    with pytest.raises(ValueError, match="at least one batch"):
        calibrate_activation_scales(m8, variables, [])
