"""Differential parity: identical inputs through the reference (torch CPU)
and through our JAX implementation must produce the same outputs.

Covers all five numerics-critical surfaces:
- composite Loss + FocalLoss/L1/SmoothL1/L2 (ref loss.py:8-117),
- target Encode (ref transforms.py:121-208) vs host flatten + device
  encode_targets,
- Decoder end to end, annotations + raw_parts (ref decoders.py:29-179),
- Evaluator, all four metric families (ref evaluator.py:208-646),
- Network forward (ref network.py:6-87): torchvision isn't installed,
  so the reference graph is hand-assembled from plain torch modules
  (its spec is 87 lines of conv/BN/ReLU) and run with bridged-identical
  weights.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference import load_reference, ref_args_from_config

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.config import Config

ref = load_reference()


@pytest.fixture(scope="module")
def cfg():
    c = Config(width=64, height=64, max_objects=4, max_parts=8, batch_size=2)
    c.set_labels(["bean", "maize"], ["leaf"])
    return c


@pytest.fixture(scope="module")
def ref_args(cfg):
    return ref_args_from_config(cfg)


def _rng(seed):
    return np.random.default_rng(926354916 + seed)


# ---------------------------------------------------------------------------
# scene generation (shared by encode / evaluator tests)
# ---------------------------------------------------------------------------


def random_scene(rng, cfg, n_objects, with_scores=False, size=None):
    """Random annotation data as plain floats; built into both frameworks'
    object models by the helpers below."""
    w, h = size or (cfg.width, cfg.height)
    objs = []
    for _ in range(n_objects):
        name = ["bean", "maize"][int(rng.integers(2))]
        ax, ay = float(rng.uniform(0, w)), float(rng.uniform(0, h))
        parts = []
        for _ in range(int(rng.integers(0, 6))):
            parts.append(
                (
                    "leaf",
                    float(rng.uniform(0, w)),
                    float(rng.uniform(0, h)),
                    float(rng.uniform(0.05, 1.0)) if with_scores else None,
                )
            )
        score = float(rng.uniform(0.05, 1.0)) if with_scores else None
        objs.append((name, ax, ay, score, parts))
    return objs


def build_ours(scene, cfg, img_size):
    objects = [
        Object(
            name,
            Keypoint(cfg.anchor_name, ax, ay, score),
            [Keypoint(k, x, y, s) for k, x, y, s in parts],
        )
        for name, ax, ay, score, parts in scene
    ]
    return ImageAnnotation("scene.jpg", objects, img_size=img_size)


def build_ref(scene, ref_args, img_size):
    objects = [
        ref.utils.Object(
            name,
            ref.utils.Keypoint(ref_args.anchor_name, ax, ay, score),
            [ref.utils.Keypoint(k, x, y, s) for k, x, y, s in parts],
        )
        for name, ax, ay, score, parts in scene
    ]
    return ref.utils.ImageAnnotation("scene.jpg", objects, img_size=img_size)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def _random_loss_inputs(rng, cfg, b=2, grid=16, all_masked=False, no_positives=False):
    m, n = cfg.n_labels, cfg.n_parts
    o, p = cfg.max_objects, cfg.max_parts
    hw = grid * grid

    def hm_target(c):
        t = rng.uniform(0.0, 1.0, (b, c, grid, grid)).astype(np.float32) ** 4
        if not no_positives:
            for bi in range(b):
                for _ in range(3):
                    ci = int(rng.integers(c))
                    yi, xi = int(rng.integers(grid)), int(rng.integers(grid))
                    t[bi, ci, yi, xi] = 1.0
        else:
            t = np.minimum(t, 0.999)
        return t

    mask_a = (
        np.zeros((b, o), bool) if all_masked else rng.uniform(size=(b, o)) < 0.7
    )
    mask_p = (
        np.zeros((b, p), bool) if all_masked else rng.uniform(size=(b, p)) < 0.7
    )
    return {
        # network outputs (NCHW, logits / raw regression maps)
        "anchor_hm": rng.normal(0, 2, (b, m, grid, grid)).astype(np.float32),
        "part_hm": rng.normal(0, 2, (b, n, grid, grid)).astype(np.float32),
        "offsets": rng.normal(0, 0.5, (b, 2, grid, grid)).astype(np.float32),
        "embeddings": rng.normal(0, 3, (b, 2, grid, grid)).astype(np.float32),
        # targets
        "t_anchor_hm": hm_target(m),
        "t_part_hm": hm_target(n),
        "anchor_offsets": rng.uniform(0, 1, (b, o, 2)).astype(np.float32),
        "part_offsets": rng.uniform(0, 1, (b, p, 2)).astype(np.float32),
        "t_embeddings": rng.normal(0, 3, (b, p, 2)).astype(np.float32),
        "anchor_inds": rng.integers(0, hw, (b, o)).astype(np.int64),
        "part_inds": rng.integers(0, hw, (b, p)).astype(np.int64),
        "anchor_mask": mask_a,
        "part_mask": mask_p,
    }


def _ref_loss_value(inp, ref_args):
    loss_mod = ref.loss.Loss(ref_args)
    t = {k: torch.from_numpy(v) for k, v in inp.items()}
    output = {
        "anchor_hm": t["anchor_hm"],
        "part_hm": t["part_hm"],
        "offsets": t["offsets"],
        "embeddings": t["embeddings"],
    }
    target = {
        "anchor_hm": t["t_anchor_hm"],
        "part_hm": t["t_part_hm"],
        "anchor_offsets": t["anchor_offsets"],
        "part_offsets": t["part_offsets"],
        "embeddings": t["t_embeddings"],
        "anchor_inds": t["anchor_inds"],
        "part_inds": t["part_inds"],
        "anchor_mask": t["anchor_mask"],
        "part_mask": t["part_mask"],
    }
    total = loss_mod(output, target)
    s = loss_mod.stats
    return (
        float(total),
        float(s.hm_loss),
        float(s.offset_loss),
        float(s.embedding_loss),
    )


def _our_loss_value(inp, cfg, hm_loss_fn):
    from structuredetector_tpu.ops.encode import EncodedTargets
    from structuredetector_tpu.ops.losses import sdnet_loss

    nhwc = lambda x: np.transpose(x, (0, 2, 3, 1))
    outputs = {
        "anchor_hm": nhwc(inp["anchor_hm"]),
        "part_hm": nhwc(inp["part_hm"]),
        "offsets": nhwc(inp["offsets"]),
        "embeddings": nhwc(inp["embeddings"]),
    }
    targets = EncodedTargets(
        anchor_hm=nhwc(inp["t_anchor_hm"]),
        part_hm=nhwc(inp["t_part_hm"]),
        anchor_inds=inp["anchor_inds"].astype(np.int32),
        part_inds=inp["part_inds"].astype(np.int32),
        anchor_offsets=inp["anchor_offsets"],
        part_offsets=inp["part_offsets"],
        embeddings=inp["t_embeddings"],
        anchor_mask=inp["anchor_mask"],
        part_mask=inp["part_mask"],
    )
    total, stats = sdnet_loss(
        outputs,
        targets,
        hm_loss_fn=hm_loss_fn,
        hm_weight=cfg.hm_weight,
        offset_weight=cfg.offset_weight,
        embedding_weight=cfg.embedding_weight,
    )
    return (
        float(total),
        float(stats["hm_loss"]),
        float(stats["offset_loss"]),
        float(stats["embedding_loss"]),
    )


@pytest.mark.parametrize("hm_loss_fn", ["mse", "focal"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_differential(cfg, ref_args, hm_loss_fn, seed):
    inp = _random_loss_inputs(_rng(seed), cfg)
    ref_args.hm_loss_fn = hm_loss_fn
    got = _our_loss_value(inp, cfg, hm_loss_fn)
    want = _ref_loss_value(inp, ref_args)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_loss_differential_empty_mask(cfg, ref_args):
    """No valid keypoints: both must fall back to zero regression loss."""
    inp = _random_loss_inputs(_rng(7), cfg, all_masked=True)
    ref_args.hm_loss_fn = "mse"
    got = _our_loss_value(inp, cfg, "mse")
    want = _ref_loss_value(inp, ref_args)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_focal_differential_no_positives(cfg, ref_args):
    """target==1 nowhere: the pure-negative fallback branch."""
    inp = _random_loss_inputs(_rng(8), cfg, no_positives=True)
    ref_args.hm_loss_fn = "focal"
    got = _our_loss_value(inp, cfg, "focal")
    want = _ref_loss_value(inp, ref_args)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("variant", ["smooth_l1", "l2"])
def test_alternate_reg_losses_differential(cfg, variant):
    from structuredetector_tpu.ops.losses import masked_l2_loss, masked_smooth_l1_loss

    rng = _rng(11)
    inp = _random_loss_inputs(rng, cfg)
    feat, target = inp["offsets"], inp["anchor_offsets"]
    inds, mask = inp["anchor_inds"], inp["anchor_mask"]

    ref_cls = ref.loss.SmoothL1Loss if variant == "smooth_l1" else ref.loss.L2Loss
    want = float(
        ref_cls()(
            torch.from_numpy(feat),
            torch.from_numpy(target),
            torch.from_numpy(inds),
            torch.from_numpy(mask),
        )
    )
    ours_fn = masked_smooth_l1_loss if variant == "smooth_l1" else masked_l2_loss
    got = float(
        ours_fn(np.transpose(feat, (0, 2, 3, 1)), target, inds.astype(np.int32), mask)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
def test_encode_differential(cfg, ref_args, seed):
    """Same annotation through ref Encode and our flatten+encode_targets."""
    import jax.numpy as jnp

    from structuredetector_tpu.data.pipeline import flatten_annotation
    from structuredetector_tpu.ops.encode import encode_targets

    rng = _rng(100 + seed)
    n_obj = int(rng.integers(0, cfg.max_objects + 2))  # can exceed max_objects
    scene = random_scene(rng, cfg, n_obj)
    img_size = (cfg.width, cfg.height)

    # reference: torch input tensor (C,H,W) just for the size probe
    ref_out = ref.transforms.Encode(ref_args)(
        torch.zeros(3, cfg.height, cfg.width), build_ref(scene, ref_args, img_size)
    )

    grid = int(cfg.width / cfg.down_ratio), int(cfg.height / cfg.down_ratio)
    flat = flatten_annotation(
        build_ours(scene, cfg, img_size),
        labels=cfg.labels,
        parts=cfg.parts,
        max_objects=cfg.max_objects,
        max_parts=cfg.max_parts,
        in_size=img_size,
        out_size=grid,
    )
    ours = encode_targets(
        jnp.asarray(flat.anchors_xy)[None],
        jnp.asarray(flat.anchor_cls)[None],
        jnp.asarray(flat.anchor_mask)[None],
        jnp.asarray(flat.parts_xy)[None],
        jnp.asarray(flat.part_kind)[None],
        jnp.asarray(flat.part_owner_xy)[None],
        jnp.asarray(flat.part_mask)[None],
        out_h=grid[1],
        out_w=grid[0],
        n_labels=cfg.n_labels,
        n_parts=cfg.n_parts,
        sigma_gauss=cfg.sigma_gauss,
    )

    nchw = lambda x: np.transpose(np.asarray(x)[0], (2, 0, 1))
    np.testing.assert_allclose(
        nchw(ours.anchor_hm), ref_out["anchor_hm"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        nchw(ours.part_hm), ref_out["part_hm"].numpy(), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(ours.anchor_inds)[0], ref_out["anchor_inds"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.part_inds)[0], ref_out["part_inds"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.anchor_mask)[0], ref_out["anchor_mask"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.part_mask)[0], ref_out["part_mask"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours.anchor_offsets)[0], ref_out["anchor_offsets"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.part_offsets)[0], ref_out["part_offsets"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.embeddings)[0], ref_out["embeddings"].numpy(), atol=1e-5
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _kp_tuple(kp):
    return (kp.kind, kp.x, kp.y, kp.score)


def _assert_annotations_match(ours, theirs):
    assert len(ours) == len(theirs)
    for got, want in zip(ours, theirs):
        assert len(got.objects) == len(want.objects)
        for o, w in zip(got.objects, want.objects):
            assert o.name == w.name
            gk, wk = _kp_tuple(o.anchor), _kp_tuple(w.anchor)
            assert gk[0] == wk[0]
            np.testing.assert_allclose(gk[1:], wk[1:], rtol=1e-4, atol=1e-4)
            assert len(o.parts) == len(w.parts)
            for gp, wp in zip(o.parts, w.parts):
                assert gp.kind == wp.kind
                np.testing.assert_allclose(
                    _kp_tuple(gp)[1:], _kp_tuple(wp)[1:], rtol=1e-4, atol=1e-4
                )


@pytest.mark.parametrize("seed", range(6))
def test_decoder_differential(cfg, ref_args, seed):
    """Random head outputs through both full Decoder paths."""
    from structuredetector_tpu.data.decoders import Decoder

    rng = _rng(200 + seed)
    b, grid = 2, 16
    m, n = cfg.n_labels, cfg.n_parts
    maps = {
        "anchor_hm": rng.normal(0, 3, (b, m, grid, grid)).astype(np.float32),
        "part_hm": rng.normal(0, 3, (b, n, grid, grid)).astype(np.float32),
        "offsets": rng.normal(0, 0.5, (b, 2, grid, grid)).astype(np.float32),
        "embeddings": rng.normal(0, 2, (b, 2, grid, grid)).astype(np.float32),
    }

    want = ref.decoders.Decoder(ref_args)(
        {k: torch.from_numpy(v) for k, v in maps.items()}, return_metadata=True
    )

    ours = Decoder(cfg, use_pallas=False)(
        {k: np.transpose(v, (0, 2, 3, 1)) for k, v in maps.items()},
        return_metadata=True,
    )

    _assert_annotations_match(ours["annotation"], want["annotation"])

    # raw (pre-grouping) conf-filtered parts feed the part-F1 metric
    assert len(ours["raw_parts"]) == len(want["raw_parts"])
    for got_b, want_b in zip(ours["raw_parts"], want["raw_parts"]):
        assert len(got_b) == len(want_b)
        for g, w in zip(got_b, want_b):
            assert g.kind == w.kind
            np.testing.assert_allclose(
                (g.x, g.y, g.score), (w.x, w.y, w.score), rtol=1e-4, atol=1e-4
            )


def test_decoder_differential_quiet_maps(cfg, ref_args):
    """Mostly sub-threshold maps: exercises empty/near-empty outputs."""
    from structuredetector_tpu.data.decoders import Decoder

    rng = _rng(300)
    b, grid = 2, 16
    maps = {
        "anchor_hm": rng.normal(-4, 1, (b, cfg.n_labels, grid, grid)).astype(np.float32),
        "part_hm": rng.normal(-4, 1, (b, cfg.n_parts, grid, grid)).astype(np.float32),
        "offsets": rng.normal(0, 0.5, (b, 2, grid, grid)).astype(np.float32),
        "embeddings": rng.normal(0, 2, (b, 2, grid, grid)).astype(np.float32),
    }
    want = ref.decoders.Decoder(ref_args)(
        {k: torch.from_numpy(v) for k, v in maps.items()}
    )
    ours = Decoder(cfg, use_pallas=False)(
        {k: np.transpose(v, (0, 2, 3, 1)) for k, v in maps.items()}
    )
    _assert_annotations_match(ours, want)


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------


def _assert_evaluations_match(ours, theirs):
    assert set(ours.labels) == set(theirs.labels)
    for label in ours.labels:
        got, want = ours[label], theirs[label]
        assert (got.tp, got.npos, got.ndet) == (want.tp, want.npos, want.ndet), label
        np.testing.assert_allclose(got.acc, want.acc, rtol=1e-9)


@pytest.mark.parametrize("seed", range(10))
def test_evaluator_differential(cfg, ref_args, seed):
    """Random prediction/GT scenes through all four metric families."""
    from structuredetector_tpu.evaluation.evaluator import Evaluator

    rng = _rng(400 + seed)
    ours_eval = Evaluator(cfg)
    ref_eval = ref.evaluator.Evaluator(ref_args)

    for _ in range(5):  # multiple images per case, tests accumulation too
        img_size = (int(rng.integers(400, 900)), int(rng.integers(400, 900)))
        gt_scene = random_scene(rng, cfg, int(rng.integers(0, 5)))
        # predictions: perturbed copies of some GT + random spurious objects
        pred_scene = []
        for name, ax, ay, _, parts in gt_scene:
            if rng.uniform() < 0.75:
                jitter = lambda v: v + float(rng.normal(0, 6))
                pred_scene.append(
                    (
                        name if rng.uniform() < 0.85 else "maize",
                        jitter(ax),
                        jitter(ay),
                        float(rng.uniform(0.3, 1.0)),
                        [
                            (k, jitter(x), jitter(y), float(rng.uniform(0.3, 1.0)))
                            for k, x, y, _ in parts
                            if rng.uniform() < 0.8
                        ],
                    )
                )
        pred_scene += random_scene(rng, cfg, int(rng.integers(0, 3)), with_scores=True)

        raw_parts_data = [
            (k, x, y, s) for _, _, _, _, parts in pred_scene for k, x, y, s in parts
        ]

        our_pred = build_ours(pred_scene, cfg, img_size)
        our_gt = build_ours(gt_scene, cfg, img_size)
        our_raw = [Keypoint(k, x, y, s) for k, x, y, s in raw_parts_data]

        ref_pred = build_ref(pred_scene, ref_args, img_size)
        ref_gt = build_ref(gt_scene, ref_args, img_size)
        ref_raw = [ref.utils.Keypoint(k, x, y, s) for k, x, y, s in raw_parts_data]

        ours_eval.accumulate(our_pred, our_gt, our_raw, eval_csi=True, eval_classif=True)
        ref_eval.accumulate(ref_pred, ref_gt, ref_raw, eval_csi=True, eval_classif=True)

    _assert_evaluations_match(ours_eval.anchor_eval, ref_eval.anchor_eval)
    _assert_evaluations_match(ours_eval.part_eval, ref_eval.part_eval)
    _assert_evaluations_match(ours_eval.csi_eval, ref_eval.csi_eval)
    _assert_evaluations_match(
        ours_eval.classification_eval, ref_eval.classification_eval
    )
    _assert_evaluations_match(ours_eval.kps_eval, ref_eval.kps_eval)

    # derived scalar metrics agree too
    got_total = ours_eval.anchor_eval.reduce()
    want_total = ref_eval.anchor_eval.reduce()
    assert got_total.f1_score == pytest.approx(want_total.f1_score)
    assert got_total.precision == pytest.approx(want_total.precision)
    assert got_total.recall == pytest.approx(want_total.recall)
    assert got_total.csi == pytest.approx(want_total.csi)


@pytest.mark.parametrize("seed", range(4))
def test_compute_csi_differential(cfg, ref_args, seed):
    from structuredetector_tpu.evaluation.evaluator import Evaluator

    rng = _rng(500 + seed)
    for _ in range(20):
        (pred,) = random_scene(rng, cfg, 1, with_scores=True)
        (gt,) = random_scene(rng, cfg, 1)
        if rng.uniform() < 0.5:  # often same label so CSI isn't trivially 0
            gt = (pred[0], *gt[1:])
        thresh = float(rng.uniform(5, 60))

        our_obj = build_ours([pred], cfg, (640, 480)).objects[0]
        our_gt = build_ours([gt], cfg, (640, 480)).objects[0]
        ref_obj = build_ref([pred], ref_args, (640, 480)).objects[0]
        ref_gt = build_ref([gt], ref_args, (640, 480)).objects[0]

        got = Evaluator.compute_csi(our_obj, our_gt, thresh)
        want = ref.evaluator.Evaluator.compute_csi(ref_obj, ref_gt, thresh)
        assert got == pytest.approx(want)


# ---------------------------------------------------------------------------
# Network forward: hand-assembled torch twin (the reference Network minus
# the torchvision import) vs our JAX model with bridged-identical weights
# ---------------------------------------------------------------------------


def _torch_sdnet(n_labels, n_parts, fpn_depth):
    """The reference Network assembled from plain torch modules.

    torchvision isn't installed here, but the reference's graph is fully
    specified by /root/reference/src/sdnet/model/network.py:32-87 (ResNet34
    encoder split into adapter + layer1..4) with Fpn up-blocks (:6-19) and
    a 1x1 Head (:22-29); the ResNet34 stages are torchvision BasicBlocks
    ([3, 4, 6, 3] at widths [64, 128, 256, 512]). Parameter names mirror
    the reference state_dict (adpater/down1..4/up1..4/head) so
    `convert_sdnet_state_dict` applies unchanged.
    """
    tnn = torch.nn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = (
                tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )
                if stride != 1 or cin != cout
                else None
            )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idn)

    def stage(cin, cout, n_blocks, stride):
        blocks = [BasicBlock(cin, cout, stride)]
        blocks += [BasicBlock(cout, cout, 1) for _ in range(n_blocks - 1)]
        return tnn.Sequential(*blocks)

    class Fpn(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.up = tnn.Upsample(scale_factor=2)  # nearest
            self.lateral = tnn.Conv2d(cin, cout, 1)
            self.conv = tnn.Sequential(
                tnn.Conv2d(cout, cout, 3, padding=1, bias=False),
                tnn.BatchNorm2d(cout),
                tnn.ReLU(inplace=True),
            )

        def forward(self, x, skip):
            return self.conv(self.up(x) + self.lateral(skip))

    class Head(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, 1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            # "adpater" [sic]: the reference's stem name, kept for
            # state_dict compatibility (network.py:43-45)
            self.adpater = tnn.Sequential(
                tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
                tnn.BatchNorm2d(64),
                tnn.ReLU(inplace=True),
                tnn.MaxPool2d(3, 2, 1),
            )
            self.down1 = stage(64, 64, 3, 1)
            self.down2 = stage(64, 128, 4, 2)
            self.down3 = stage(128, 256, 6, 2)
            self.down4 = stage(256, 512, 3, 2)
            self.up1 = tnn.Conv2d(512, fpn_depth, 1)
            self.up2 = Fpn(256, fpn_depth)
            self.up3 = Fpn(128, fpn_depth)
            self.up4 = Fpn(64, fpn_depth)
            self.head = Head(fpn_depth, n_labels + n_parts + 4)

        def forward(self, x):
            p1 = self.adpater(x)
            p2 = self.down1(p1)
            p3 = self.down2(p2)
            p4 = self.down3(p3)
            p5 = self.down4(p4)
            f = self.up1(p5)
            f = self.up2(f, p4)
            f = self.up3(f, p3)
            f = self.up4(f, p2)
            out = self.head.conv(f)
            return {
                "anchor_hm": out[:, :n_labels],
                "part_hm": out[:, n_labels : n_labels + n_parts],
                "offsets": out[:, n_labels + n_parts : n_labels + n_parts + 2],
                "embeddings": out[:, n_labels + n_parts + 2 :],
            }

    return Net()


@pytest.mark.slow  # full 34-layer forward on CPU, both frameworks
def test_network_forward_differential(cfg):
    """Bridge-identical weights -> fp32 forward agreement <= 1e-4 on
    random inputs. Closes the last un-cross-checked numerics surface
    (the other four are pinned by the tests above)."""
    import jax.numpy as jnp

    from structuredetector_tpu.models.network import build_model
    from structuredetector_tpu.models.torch_bridge import convert_sdnet_state_dict

    tm = _torch_sdnet(cfg.n_labels, cfg.n_parts, cfg.fpn_depth)
    tm.eval()

    # randomize BN affine + running stats away from the (near-identity)
    # defaults so a transposed/missing stat would actually show up
    gen = torch.Generator().manual_seed(926354916)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.weight.uniform_(0.8, 1.2, generator=gen)
                mod.bias.normal_(0.0, 0.05, generator=gen)
                mod.running_mean.normal_(0.0, 0.05, generator=gen)
                mod.running_var.uniform_(0.8, 1.2, generator=gen)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sdnet_state_dict(sd)

    fp32_cfg = Config(
        width=cfg.width, height=cfg.height, fpn_depth=cfg.fpn_depth,
        max_objects=cfg.max_objects, max_parts=cfg.max_parts, use_amp=False,
    )
    fp32_cfg.set_labels(list(cfg.labels), list(cfg.parts))
    model = build_model(fp32_cfg)

    rng = _rng(900)
    x = rng.normal(size=(2, cfg.height, cfg.width, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = model.apply(variables, jnp.asarray(x), train=False)

    for key in ("anchor_hm", "part_hm", "offsets", "embeddings"):
        w = np.transpose(want[key].numpy(), (0, 2, 3, 1))
        g = np.asarray(got[key], np.float32)
        assert g.shape == w.shape, key
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4, err_msg=key)
