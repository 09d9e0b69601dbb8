"""Evaluator: counters, greedy matching, CSI, classification
(reference evaluator.py semantics on hand-built scenes)."""

import numpy as np
import pytest

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.evaluation import Evaluation, Evaluations, Evaluator


def obj(name, x, y, parts=(), score=0.9):
    anchor = Keypoint("stem", x, y, score)
    kps = [Keypoint("leaf", px, py, ps) for px, py, ps in parts]
    return Object(name, anchor, kps)


def ann(objects, img_size=(512, 512), path="im.jpg"):
    return ImageAnnotation(path, list(objects), img_size)


# --- Evaluation counters ---------------------------------------------------


def test_evaluation_derived_metrics():
    e = Evaluation(tp=3, npos=5, ndet=4)
    assert e.fp == 1 and e.fn == 2
    assert e.precision == pytest.approx(3 / 4)
    assert e.recall == pytest.approx(3 / 5)
    assert e.f1_score == pytest.approx(2 * 3 / 9)
    assert e.csi == pytest.approx(3 / 6)


def test_evaluation_empty_conventions():
    """Empty-denominator conventions (evaluator.py:48-63)."""
    e = Evaluation()
    assert e.precision == 1 and e.recall == 1 and e.f1_score == 1 and e.csi == 1
    assert Evaluation(0, 2, 0).precision == 0  # no dets but positives exist
    assert Evaluation(0, 0, 2).recall == 0


def test_evaluation_add():
    a = Evaluation(1, 2, 3, acc=[0.1])
    b = Evaluation(2, 2, 2, acc=[0.2])
    c = a + b
    assert (c.tp, c.npos, c.ndet) == (3, 4, 5)
    assert c.acc == [0.1, 0.2]
    # a unchanged (copy semantics)
    assert a.tp == 1 and a.acc == [0.1]


def test_evaluation_preconditions():
    with pytest.raises(AssertionError):
        Evaluation(tp=3, npos=2, ndet=3)


def test_evaluations_union_merge():
    a = Evaluations(["x", "y"])
    b = Evaluations(["y", "z"])
    a["x"].tp = a["x"].npos = a["x"].ndet = 1
    a["y"].npos = 2
    b["y"].npos = 3
    b["z"].ndet = 4
    m = a | b
    assert set(m.labels) == {"x", "y", "z"}
    assert m["y"].npos == 5
    assert m["x"].tp == 1 and m["z"].ndet == 4


def test_evaluations_inplace_union_merge():
    """`|=` — the reference's own __ior__ (evaluator.py:180-185) crashes
    on plain dicts; ours must behave like `a = a | b`."""
    a = Evaluations(["x", "y"])
    b = Evaluations(["y", "z"])
    a["x"].tp = a["x"].npos = a["x"].ndet = 1
    a["y"].npos = 2
    b["y"].npos = 3
    b["z"].ndet = 4
    expected = a | b
    a |= b
    assert set(a.labels) == set(expected.labels) == {"x", "y", "z"}
    for label in a.labels:
        got, want = a[label], expected[label]
        assert (got.tp, got.npos, got.ndet) == (want.tp, want.npos, want.ndet)


def test_evaluations_reduce():
    evs = Evaluations(["x", "y"])
    evs["x"].tp = evs["x"].npos = evs["x"].ndet = 2
    evs["y"].npos = 3
    total = evs.reduce()
    assert (total.tp, total.npos, total.ndet) == (2, 5, 2)


# --- Evaluator families ----------------------------------------------------


def test_eval_anchor_perfect_match(tiny_config):
    # both GT and prediction live in network-input space (64x64 here);
    # the evaluator rescales both to the original img_size
    # (evaluator.py:246-248)
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8), obj("maize", 300 / 8, 300 / 8)])
    pred = ann([obj("bean", 100 / 8, 100 / 8), obj("maize", 300 / 8, 300 / 8)])
    res = ev.eval_anchor(pred, gt)
    assert res["bean"].tp == 1 and res["maize"].tp == 1
    assert res.reduce().f1_score == 1.0


def test_eval_anchor_wrong_label_no_match(tiny_config):
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8)])
    pred = ann([obj("maize", 100 / 8, 100 / 8)])
    res = ev.eval_anchor(pred, gt)
    assert res["bean"].tp == 0 and res["maize"].tp == 0
    assert res["maize"].fp == 1 and res["bean"].fn == 1


def test_eval_anchor_distance_threshold(tiny_config):
    ev = Evaluator(tiny_config)
    # dist_threshold = 0.05 * 512 = 25.6 px in original space
    gt = ann([obj("bean", 100 / 8, 100 / 8)])
    near = ann([obj("bean", 120 / 8, 100 / 8)])  # 20 px away in original space
    far = ann([obj("bean", 130 / 8, 100 / 8)])  # 30 px away
    assert ev.eval_anchor(near, gt)["bean"].tp == 1
    assert ev.eval_anchor(far, gt)["bean"].tp == 0


def test_eval_anchor_greedy_visited(tiny_config):
    """Two predictions near one GT: only the higher-scored matches
    (visited flags, evaluator.py:267-283)."""
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8)])
    pred = ann([obj("bean", 100 / 8, 100 / 8, score=0.9),
                obj("bean", 104 / 8, 100 / 8, score=0.8)])
    res = ev.eval_anchor(pred, gt)
    assert res["bean"].tp == 1
    assert res["bean"].fp == 1


def test_eval_part_raw_detections(tiny_config):
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8,
                  parts=[(110 / 8, 110 / 8, None), (200 / 8, 200 / 8, None)])])
    raw_parts = [Keypoint("leaf", 110 / 8, 110 / 8, 0.8),
                 Keypoint("leaf", 400 / 8, 400 / 8, 0.7)]
    res = ev.eval_part(gt, raw_parts)
    assert res["leaf"].tp == 1
    assert res["leaf"].npos == 2 and res["leaf"].ndet == 2


def test_compute_csi_perfect():
    pred = obj("bean", 10, 10, parts=[(20, 20, 0.9), (5, 5, 0.8)])
    gt = obj("bean", 10, 10, parts=[(20, 20, None), (5, 5, None)])
    assert Evaluator.compute_csi(pred, gt, dist_thresh=5.0) == 1.0


def test_compute_csi_wrong_label_zero():
    pred = obj("bean", 10, 10)
    gt = obj("maize", 10, 10)
    assert Evaluator.compute_csi(pred, gt, dist_thresh=5.0) == 0.0


def test_compute_csi_partial():
    """anchor match + 1 of 2 parts: tp=2, npos=3, ndet=2 -> 2/3."""
    pred = obj("bean", 10, 10, parts=[(20, 20, 0.9)])
    gt = obj("bean", 10, 10, parts=[(20, 20, None), (40, 40, None)])
    assert Evaluator.compute_csi(pred, gt, dist_thresh=5.0) == pytest.approx(2 / 3)


def test_eval_csi_threshold(tiny_config):
    ev = Evaluator(tiny_config)
    s = 8  # net->img scale for 512 original
    gt = ann([obj("bean", 100 / s, 100 / s,
                  parts=[(110 / s, 110 / s, None), (200 / s, 200 / s, None),
                         (90 / s, 90 / s, None)])])
    # anchor + 2/3 parts -> csi = 3/4 = 0.75 >= default threshold 0.75
    pred = ann([obj("bean", 100 / s, 100 / s,
                    parts=[(110 / s, 110 / s, 0.9), (90 / s, 90 / s, 0.8)])])
    res = ev.eval_csi(pred, gt)
    assert res["bean"].tp == 1
    # anchor + 1/3 parts -> csi = 2/5 < 0.75
    pred2 = ann([obj("bean", 100 / s, 100 / s, parts=[(110 / s, 110 / s, 0.9)])])
    assert ev.eval_csi(pred2, gt)["bean"].tp == 0


def test_eval_classif_buckets(tiny_config):
    ev = Evaluator(tiny_config)
    s = 8
    gt = ann([obj("bean", 100 / s, 100 / s,
                  parts=[(110 / s, 110 / s, None), (90 / s, 90 / s, None)])])
    right_count = ann([obj("bean", 100 / s, 100 / s,
                           parts=[(300 / s, 300 / s, 0.9), (350 / s, 350 / s, 0.8)])])
    res = ev.eval_classif(right_count, gt)
    # same bucket bean_2, within distance -> TP even though parts are wrong
    assert res["bean_2"].tp == 1

    wrong_count = ann([obj("bean", 100 / s, 100 / s, parts=[(110 / s, 110 / s, 0.9)])])
    res2 = ev.eval_classif(wrong_count, gt)
    assert res2["bean_1"].tp == 0 and res2["bean_1"].fp == 1
    assert res2["bean_2"].fn == 1


def test_classification_label_space(tiny_config):
    ev = Evaluator(tiny_config)
    labels = ev.get_classification_labels()
    assert "bean_0" in labels and "maize_9" in labels
    assert len(labels) == 20


def test_accumulate_and_summary(tiny_config):
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8, parts=[(110 / 8, 110 / 8, None)])])
    pred = ann([obj("bean", 100 / 8, 100 / 8, parts=[(110 / 8, 110 / 8, 0.9)])])
    raw = [Keypoint("leaf", 110 / 8, 110 / 8, 0.9)]
    ev.accumulate(pred, gt, raw, eval_csi=True, eval_classif=True)
    s = ev.scalar_summary()
    assert s["anchor/f1_total"] == 1.0
    assert s["part/f1_total"] == 1.0
    assert s["csi/f1_total"] == 1.0
    assert s["classif/f1_total"] == 1.0
    # kps union merges anchor and part label spaces
    assert ev.kps_eval.reduce().tp == 2


def test_csv_export(tiny_config, tmp_path):
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8)])
    pred = ann([obj("bean", 100 / 8, 100 / 8)])
    ev.accumulate(pred, gt)
    path = tmp_path / "kps.csv"
    ev.save_kps_csv(path)
    lines = path.read_text().splitlines()
    assert any(line.startswith("bean,") for line in lines)
    bean = [l for l in lines if l.startswith("bean,")][0].split(",")
    assert float(bean[3]) == 1.0  # f1


def test_accumulate_does_not_mutate_inputs(tiny_config):
    """resized() copies must be used — accumulate must not scale the
    caller's annotations (they're reused across metric families)."""
    ev = Evaluator(tiny_config)
    gt = ann([obj("bean", 100 / 8, 100 / 8)])
    pred = ann([obj("bean", 100 / 8, 100 / 8)])
    ev.accumulate(pred, gt, eval_csi=True, eval_classif=True)
    assert gt.objects[0].x == 100 / 8
    assert pred.objects[0].x == 100 / 8


def test_eval_grouping_accuracy(tiny_config):
    """Direct part->parent assignment rate: parts attached to the wrong
    predicted object count as incorrect; localization misses are skipped."""
    gt = ann([
        obj("bean", 10, 10, parts=[(12, 12, None)]),
        obj("bean", 50, 50, parts=[(48, 48, None)]),
    ], img_size=(64, 64))
    # both parts localized, but the second is attached to the WRONG plant
    pred = ann([
        obj("bean", 10, 10, parts=[(12, 12, 0.9), (48, 48, 0.8)]),
        obj("bean", 50, 50, parts=[]),
    ], img_size=(64, 64))
    ev = Evaluator(tiny_config)
    correct, total = ev.eval_grouping(pred, gt)
    assert (correct, total) == (1, 2)

    ev.accumulate(pred, gt, [], eval_csi=True, eval_classif=True)
    s = ev.scalar_summary()
    assert s["grouping/accuracy"] == pytest.approx(0.5)
    assert s["grouping/matched_parts"] == 2.0


def test_eval_grouping_skips_unlocalized(tiny_config):
    gt = ann([obj("bean", 10, 10, parts=[(12, 12, None)])], img_size=(64, 64))
    # predicted part is nowhere near any GT part -> not counted at all
    pred = ann([obj("bean", 10, 10, parts=[(40, 40, 0.9)])], img_size=(64, 64))
    ev = Evaluator(tiny_config)
    assert ev.eval_grouping(pred, gt) == (0, 0)


def test_per_label_summary_scalars(tiny_config):
    gt = ann([obj("bean", 10, 10, parts=[(12, 12, None)])], img_size=(64, 64))
    pred = ann([obj("bean", 10, 10, parts=[(12, 12, 0.9)])], img_size=(64, 64))
    ev = Evaluator(tiny_config)
    ev.accumulate(pred, gt, [Keypoint("leaf", 12, 12, 0.9)],
                  eval_csi=True, eval_classif=True)
    s = ev.scalar_summary()
    assert s["anchor/precision_bean"] == 1.0
    assert s["anchor/recall_bean"] == 1.0
    assert "anchor/acc_bean" in s
    assert s["part/recall_leaf"] == 1.0
