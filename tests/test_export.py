"""Export artifact: serialize, reload, numerical equivalence
(reference export path parity, SURVEY.md §3.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from structuredetector_tpu.config import Config
from structuredetector_tpu.export import export_model, load_exported, make_export_fn
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.network import build_model
from structuredetector_tpu.ops.decode import split_head_output
from structuredetector_tpu.ops.tensor import clamped_sigmoid, plateau_nms



pytestmark = pytest.mark.slow  # compile-heavy: jax.export round-trips


def make_config():
    cfg = Config(width=32, height=32, fpn_depth=16, max_objects=2, max_parts=4,
                 use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    return cfg


def test_export_roundtrip(tmp_path):
    cfg = make_config()
    model, variables = init_model(cfg)
    path = export_model(cfg, variables, tmp_path / "model.sdz", batch_size=2)
    assert path.exists()

    call, meta = load_exported(path)
    assert meta["anchors"] == ["bean", "maize"]
    assert meta["parts"] == ["leaf"]
    assert meta["width"] == 32 and meta["scale_factor"] == 4.0

    x = np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(call(x))

    # reference result: forward + fused sigmoid/NMS on heatmaps
    fn = make_export_fn(build_model(cfg), variables, cfg.n_labels, cfg.n_parts)
    want = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # heatmap channels are probabilities post-NMS; regression channels raw
    assert got[..., :3].min() >= 0.0 and got[..., :3].max() <= 1.0
    d = split_head_output(jnp.asarray(got), 2, 1)
    assert d["offsets"].shape == (2, 8, 8, 2)


def test_export_fn_fuses_sigmoid_nms():
    cfg = make_config()
    model, variables = init_model(cfg)
    fn = make_export_fn(build_model(cfg), variables, cfg.n_labels, cfg.n_parts)
    x = jnp.zeros((1, 32, 32, 3))
    out = fn(x)
    raw = model.apply(variables, x, train=False, raw_output=True)
    want_hm = plateau_nms(clamped_sigmoid(raw[..., :3]))
    np.testing.assert_allclose(np.asarray(out[..., :3]), np.asarray(want_hm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 3:]), np.asarray(raw[..., 3:]), atol=1e-6)


def test_export_dynamic_batch(tmp_path):
    cfg = make_config()
    model, variables = init_model(cfg)
    p = export_model(cfg, variables, tmp_path / "dyn.sdz", dynamic_batch=True)
    call, meta = load_exported(p)
    assert meta["dynamic_batch"]
    out1 = np.asarray(call(np.zeros((1, 32, 32, 3), np.float32)))
    out3 = np.asarray(call(np.zeros((3, 32, 32, 3), np.float32)))
    assert out1.shape[0] == 1 and out3.shape[0] == 3
    np.testing.assert_allclose(out3[0], out1[0], atol=1e-5)


def test_export_uint8_input(tmp_path):
    """uint8 artifacts consume raw bytes and normalize on-device; the
    result matches the float32 fold-normalization artifact exactly on
    integral pixel values."""
    cfg = make_config()
    model, variables = init_model(cfg)

    with pytest.raises(ValueError):
        export_model(cfg, variables, tmp_path / "bad.sdz", uint8_input=True)

    p8 = export_model(cfg, variables, tmp_path / "u8.sdz",
                      fold_normalization=True, uint8_input=True)
    pf = export_model(cfg, variables, tmp_path / "f32.sdz",
                      fold_normalization=True)
    call8, meta8 = load_exported(p8)
    callf, metaf = load_exported(pf)
    assert meta8["input_dtype"] == "uint8" and meta8["normalized"]
    assert metaf["input_dtype"] == "float32"

    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)
    got = np.asarray(call8(u8))
    want = np.asarray(callf(u8.astype(np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # load_exported casts per metadata: integral float input works too
    np.testing.assert_allclose(np.asarray(call8(u8.astype(np.float32))), got,
                               atol=1e-6)


def test_export_roundtrip_other_backbone(tmp_path):
    """Exported artifacts carry whatever --backbone built them; the
    caller needs no model code, so no backbone flag on the load side."""
    cfg = Config(width=32, height=32, fpn_depth=16, max_objects=2, max_parts=4,
                 use_amp=False, backbone="resnet18")
    cfg.set_labels(["bean", "maize"], ["leaf"])
    model, variables = init_model(cfg)
    path = export_model(cfg, variables, tmp_path / "r18.sdz", batch_size=1)
    call, meta = load_exported(path)
    x = np.random.default_rng(1).normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(call(x))
    fn = make_export_fn(build_model(cfg), variables, cfg.n_labels, cfg.n_parts)
    np.testing.assert_allclose(got, np.asarray(fn(jnp.asarray(x))), atol=1e-5)


def test_export_int8_roundtrip(tmp_path):
    """--int8 export: the artifact embeds pre-quantized int8 kernels and
    reproduces the live int8 model exactly."""
    from structuredetector_tpu.models.quantize import prequantize_variables

    cfg = make_config()
    cfg.int8 = True
    _, variables = init_model(make_config())  # float checkpoint
    path = export_model(cfg, variables, tmp_path / "model8.sdz", batch_size=2)
    call, meta = load_exported(path)
    assert meta["int8"] is True

    x = np.random.default_rng(1).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(call(x))
    fn = make_export_fn(build_model(cfg), prequantize_variables(variables),
                        cfg.n_labels, cfg.n_parts)
    want = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_predictor_matches_live_predictor(tmp_path):
    """ExportPredictor (artifact-backed) reproduces the live Predictor's
    detections: same feed, sigmoid+NMS fused in-graph vs applied live."""
    from structuredetector_tpu.predictor import ExportPredictor, Predictor

    cfg = make_config()
    cfg.anchor_name = "stem"
    _, variables = init_model(cfg)
    path = export_model(cfg, variables, tmp_path / "m.sdz", batch_size=2)

    ep = ExportPredictor(path, max_objects=cfg.max_objects,
                         max_parts=cfg.max_parts)
    assert ep.batch_size == 2

    from PIL import Image
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8))
            for _ in range(3)]  # 3 images -> chunked 2 + padded 1

    live = Predictor(cfg, device_normalize=False)
    live.variables = variables
    want = live.predict_batch(imgs)
    got = ep.predict_batch(imgs)

    assert len(got) == 3
    for w, g in zip(want, got):
        assert g.img_size == (56, 40)
        assert len(g.objects) == len(w.objects)
        for ow, og in zip(w.objects, g.objects):
            assert ow.name == og.name
            assert og.anchor.x == pytest.approx(ow.anchor.x, abs=1e-3)
            assert og.anchor.y == pytest.approx(ow.anchor.y, abs=1e-3)


def test_export_predictor_feed_signature_and_prepared_image(tmp_path):
    """Artifact variants expose the serve-layer feed signature, and a
    `PreparedImage` (native decode fast path) reproduces the PIL path
    bit-for-bit — including the --norm float case, where the feed must
    be raw [0, 255] float32 because the graph owns /255 + mean/std."""
    from PIL import Image

    from structuredetector_tpu.predictor import ExportPredictor, PreparedImage

    cfg = make_config()
    cfg.anchor_name = "stem"
    _, variables = init_model(cfg)

    plain = export_model(cfg, variables, tmp_path / "plain.sdz", batch_size=2)
    norm = export_model(cfg, variables, tmp_path / "norm.sdz", batch_size=2,
                        fold_normalization=True)
    u8 = export_model(cfg, variables, tmp_path / "u8.sdz", batch_size=2,
                      fold_normalization=True, uint8_input=True)

    rng = np.random.default_rng(7)
    pil = Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8))

    # (artifact, feed_uint8, feed_normalize)
    for path, want_u8, want_norm in (
        (plain, False, True), (norm, False, False), (u8, True, False),
    ):
        ep = ExportPredictor(path, max_objects=cfg.max_objects,
                             max_parts=cfg.max_parts)
        assert (ep.feed_uint8, ep.feed_normalize) == (want_u8, want_norm), path

        arr = ep._transform(pil)  # the exact array the PIL path feeds
        if want_u8:
            assert arr.dtype == np.uint8
        else:
            assert arr.dtype == np.float32
            # --norm artifacts eat raw [0,255]; plain ones normalized
            assert (arr.max() > 2.0) == (not want_norm)

        via_pil = ep.predict_batch([pil])
        via_prepared = ep.predict_batch([PreparedImage(arr, pil.size)])
        assert len(via_pil) == len(via_prepared) == 1
        assert via_prepared[0].img_size == pil.size
        assert via_prepared[0].json_repr() == via_pil[0].json_repr()


def test_export_all_options_combined(tmp_path):
    """The full export option stack composes: int8 kernels + calibrated
    static activation scales + uint8 input signature + folded
    normalization + dynamic batch, consumed by ExportPredictor."""
    from structuredetector_tpu.models.quantize import (
        calibrate_activation_scales,
    )
    from structuredetector_tpu.predictor import ExportPredictor

    cfg = make_config()
    cfg.int8 = True
    cfg.anchor_name = "stem"
    m8 = build_model(cfg)
    _, variables = init_model(make_config())
    # calibrate on serving-equivalent normalized inputs
    from structuredetector_tpu.data.augment import Normalize
    from PIL import Image
    rng = np.random.default_rng(0)
    pil = Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8))
    batch = np.stack([Normalize()(pil)] * 2)
    cal = calibrate_activation_scales(m8, variables, [batch])

    path = export_model(cfg, cal, tmp_path / "all.sdz", batch_size=1,
                        fold_normalization=True, dynamic_batch=True,
                        uint8_input=True)
    ep = ExportPredictor(path, max_objects=cfg.max_objects,
                         max_parts=cfg.max_parts)
    assert ep.batch_size is None  # dynamic
    anns = ep.predict_batch([pil, pil, pil])  # odd batch via dynamic dim
    assert len(anns) == 3 and anns[0].img_size == (32, 32)
