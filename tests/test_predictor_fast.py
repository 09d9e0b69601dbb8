"""Predictor serving fast path (cfirst head + fused Pallas decode).

`Predictor(fast_path=True)` swaps the NHWC forward + `Decoder` device
phase for one jitted program: channel-leading head
(`models.network._CFirstHead`) + `ops.decode.decode_feature_maps_cfirst`
(fused Pallas sigmoid/NMS/top-k). Exact-equality of the two decode
paths is pinned in tests/test_decode.py (same maps in -> identical
detections out) and head-layout agreement in
TestCFirstFastPath.test_model_head_layouts_agree (atol 5e-5); these
tests cover the *wiring*: same weights end-to-end through both
predictor paths must yield the same annotations (the einsum vs conv
head differ by float round-off, so coordinates compare with a loose
pixel tolerance, structure exactly).
"""

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.predictor import Predictor


def _summarize(ann):
    """Annotation -> comparable structure: per-object label + anchor
    (x, y) + sorted part kinds."""
    return [
        (o.name, o.anchor.x, o.anchor.y, sorted(p.kind for p in o.parts))
        for o in sorted(ann.objects, key=lambda o: (o.anchor.x, o.anchor.y))
    ]


@pytest.fixture(scope="module")
def image(request):
    r = np.random.default_rng(321)
    return Image.fromarray(r.integers(0, 255, (80, 96, 3), np.uint8))


@pytest.mark.parametrize("device_normalize", [True, False])
def test_fast_path_matches_default(tiny_config, image, device_normalize):
    base = Predictor(tiny_config, device_normalize=device_normalize,
                     fast_path=False)
    fast = Predictor(tiny_config, device_normalize=device_normalize,
                     fast_path=True)
    fast.variables = base.variables  # identical weights end-to-end
    assert fast._fused_step is not None and base._fused_step is None

    want = _summarize(base.predict_image(image))
    got = _summarize(fast.predict_image(image))
    assert len(got) == len(want)
    for (ln, xn, yn, pn), (lf, xf, yf, pf) in zip(want, got):
        assert lf == ln
        assert pf == pn
        np.testing.assert_allclose((xf, yf), (xn, yn), atol=0.5)


def test_fast_path_tiled(tiny_config, image):
    """predict_tiled routes through the same _device_decode."""
    base = Predictor(tiny_config, fast_path=False)
    fast = Predictor(tiny_config, fast_path=True)
    fast.variables = base.variables

    big = image.resize((130, 90))
    want = _summarize(base.predict_tiled(big, batch_size=4))
    got = _summarize(fast.predict_tiled(big, batch_size=4))
    assert len(got) == len(want)
    for (ln, xn, yn, pn), (lf, xf, yf, pf) in zip(want, got):
        assert lf == ln and pf == pn
        np.testing.assert_allclose((xf, yf), (xn, yn), atol=0.5)


def test_fast_path_auto_off_on_cpu(tiny_config):
    """Auto default only engages on a TPU backend (interpret-mode
    Pallas is correct but slow on CPU)."""
    import jax

    p = Predictor(tiny_config)
    assert p.fast_path == (jax.default_backend() == "tpu")
