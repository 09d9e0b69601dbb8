"""Evaluation engine: greedy matching metrics.

Semantics mirror the reference exactly
(`/root/reference/src/sdnet/model/evaluator.py`):

- `Evaluation` — tp/npos/ndet counters with precision/recall/F1/CSI and
  localization accuracy mean/stderr (`evaluator.py:13-122`); F1 is
  computed as 2*tp/(npos+ndet) and CSI as tp/(npos+ndet-tp).
- `Evaluations` — per-label map with `+`, `|` union-merge and micro-
  average `reduce()` (`evaluator.py:125-205`).
- `Evaluator` — four metric families accumulated per image
  (`evaluator.py:226-242`):
  * anchor localization: score-sorted greedy matching of predicted
    anchors to nearest GT within `dist_threshold * min(img_size)` with
    visited flags (`eval_anchor`, :244-284),
  * part localization on *raw* pre-grouping part detections
    (`eval_part`, :286-334),
  * CSI: per-object structural score (`compute_csi`, :538-581), object
    counts as TP iff csi >= csi_threshold (`eval_csi`, :380-420),
  * classification: objects bucketed by "{label}_{nb_parts}"
    (`eval_classif`, :429-474).

All matching happens after resizing annotations back to the original
image size (`evaluator.py:246-248`).

Divergence (documented): the reference hardcodes the classification
label space to bean_0..9/maize_0..9 (`evaluator.py:422-427` — marked
"WARNING: Hardcoded"); here it is derived as {label}_{0..9} for the
configured labels, which is identical for the reference's label set.
"""

from __future__ import annotations

import sys
from copy import copy
from functools import reduce
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..annotations import dict_grouping

PART_COUNT_BUCKETS = 10  # bean_0..9 (evaluator.py:425)


class Evaluation:
    def __init__(self, tp=0, npos=0, ndet=0, acc=None, counts=None):
        Evaluation._precondition(tp, npos, ndet)
        self.tp = tp
        self.npos = npos
        self.ndet = ndet
        self.acc: List[float] = acc or []
        self.count_errors: list = counts or []

    def reset(self):
        self.__init__()

    def __iadd__(self, other: "Evaluation"):
        self.tp += other.tp
        self.npos += other.npos
        self.ndet += other.ndet
        self.acc = self.acc + other.acc
        self.count_errors = self.count_errors + other.count_errors
        return self

    def __add__(self, other: "Evaluation"):
        out = copy(self)
        out.acc = list(self.acc)
        out.count_errors = list(self.count_errors)
        out += other
        return out

    @property
    def fp(self):
        return self.ndet - self.tp

    @property
    def fn(self):
        return self.npos - self.tp

    @property
    def csi(self):
        d = self.npos + self.ndet - self.tp
        return self.tp / d if d != 0 else 1

    @property
    def precision(self):
        return self.tp / self.ndet if self.ndet != 0 else 1 if self.npos == 0 else 0

    @property
    def recall(self):
        return self.tp / self.npos if self.npos != 0 else 1 if self.ndet == 0 else 0

    @property
    def f1_score(self):
        s = self.npos + self.ndet
        return 2 * self.tp / s if s != 0 else 1

    @property
    def avg_acc(self):
        return float(np.mean(self.acc)) if self.acc else float("nan")

    @property
    def acc_err(self):
        return (
            float(np.std(self.acc) / np.sqrt(len(self.acc)))
            if self.acc
            else float("nan")
        )

    def stats(self):
        return (
            f"{self.npos}",
            f"{self.ndet}",
            f"{self.recall:.2%}",
            f"{self.precision:.2%}",
            f"{self.f1_score:.2%}",
            f"{self.avg_acc:.4%}",
            f"{self.acc_err:.4%}",
        )

    @staticmethod
    def columns():
        from rich.table import Column

        return (
            Column("Gts.", justify="right"),
            Column("Preds.", justify="right"),
            Column("Rec.", justify="right"),
            Column("Prec.", justify="right"),
            Column("F1 Score", justify="right", style="green"),
            Column("L. Acc.", justify="right"),
            Column("L. Err.", justify="right"),
        )

    def pretty_print(self):
        from rich import print as rprint
        from rich.table import Table

        table = Table(*Evaluation.columns())
        table.add_row(*self.stats())
        rprint(table)

    def save_conf_matrix(self, save_dir="."):
        """Per-label part-count confusion matrices -> conf_mat_<label>.npy
        (evaluator.py:108-114)."""
        by_label = dict_grouping(self.count_errors, lambda t: t[0])
        for label, errs in by_label.items():
            conf = np.zeros((PART_COUNT_BUCKETS, PART_COUNT_BUCKETS))
            for _, p, e in errs:
                conf[e, p] += 1
            np.save(Path(save_dir) / f"conf_mat_{label}.npy", conf)

    def __repr__(self):
        return (
            f"f1: {self.f1_score:.2%}, rec: {self.recall:.2%}, "
            f"prec: {self.precision:.2%}, npos: {self.npos}, ndet: {self.ndet}, "
            f"tp/fp/fn: {self.tp}/{self.fp}/{self.fn}, avg_acc: {self.avg_acc:.2}"
        )

    @staticmethod
    def _precondition(tp, npos, ndet):
        assert tp >= 0 and ndet >= 0 and npos >= 0, "tp, npos and ndet should be positive"
        assert tp <= ndet, "tp must be lower than or equal to ndet"
        assert tp <= npos, "tp must be lower than or equal to npos"


class Evaluations:
    def __init__(self, labels=None):
        self.evals: Dict[str, Evaluation] = (
            {label: Evaluation() for label in labels} if labels else {}
        )

    def reset(self):
        for label in self.evals:
            self.evals[label].reset()

    @property
    def labels(self):
        return self.evals.keys()

    def items(self):
        return self.evals.items()

    def __getitem__(self, label):
        return self.evals[label]

    def __setitem__(self, label, item):
        self.evals[label] = item

    def __len__(self):
        return len(self.evals)

    def __add__(self, other: "Evaluations"):
        assert self.labels == other.labels, "The Evaluations should have the same labels"
        out = Evaluations()
        out.evals = {label: self.evals[label] + e for label, e in other.items()}
        return out

    def __iadd__(self, other: "Evaluations"):
        assert self.labels == other.labels, "The Evaluations should have the same labels"
        for label, e in other.items():
            self.evals[label] += e
        return self

    def __or__(self, other: "Evaluations"):
        """Union-merge: shared labels summed, exclusive labels kept
        (evaluator.py:167-178)."""
        out = Evaluations()
        out.evals = {
            label: self[label] + other[label] for label in self.labels & other.labels
        }
        out.evals.update({label: self[label] for label in self.labels - other.labels})
        out.evals.update({label: other[label] for label in other.labels - self.labels})
        return out

    def reduce(self) -> Evaluation:
        return reduce(Evaluation.__iadd__, self.evals.values(), Evaluation())

    def pretty_print(self, table_name=None):
        from rich import print as rprint
        from rich.table import Table

        table = Table("Label", *Evaluation.columns(), title=table_name)
        for label, e in self.items():
            table.add_row(label, *e.stats())
        if len(self) > 1:
            table.add_row("Total", *self.reduce().stats(), style="bold")
        rprint(table)

    def __repr__(self):
        desc = ""
        if len(self) > 1:
            desc += f"total: {self.reduce()}\n"
        desc += "\n".join(f"{label}: {e}" for label, e in self.items())
        return desc


def _greedy_match(preds, gts, dist_thresh, result: Evaluation, score_key, dist_fn):
    """Score-sorted greedy nearest matching with visited flags — the
    shared inner loop of all reference metric families
    (evaluator.py:264-283 et al.)."""
    result.ndet = len(preds)
    result.npos = len(gts)
    preds = sorted(preds, key=score_key, reverse=True)
    visited = [False] * len(gts)
    for pred in preds:
        min_dist = sys.float_info.max
        j_min = None
        for j, gt in enumerate(gts):
            d = dist_fn(pred, gt)
            if d < min_dist:
                min_dist = d
                j_min = j
        if min_dist < dist_thresh and not visited[j_min]:
            visited[j_min] = True
            result.tp += 1
            result.acc.append(min_dist)
    return result


class Evaluator:
    def __init__(self, config):
        self.config = config
        self.labels = list(config.labels.keys())
        self.kp_labels = list(config.parts.keys())
        self.reset()

    def reset(self):
        self.anchor_eval = Evaluations(self.labels)
        self.part_eval = Evaluations(self.kp_labels)
        self.csi_eval = Evaluations(self.labels)
        self.classification_eval = Evaluations(self.get_classification_labels())

    @property
    def kps_eval(self) -> Evaluations:
        return self.anchor_eval | self.part_eval

    def get_classification_labels(self):
        """{label}_{0..9} per configured label — generalizes the
        reference's hardcoded bean_/maize_ list (evaluator.py:422-427)."""
        return [
            f"{label}_{i}" for label in self.labels for i in range(PART_COUNT_BUCKETS)
        ]

    def accumulate(
        self,
        prediction,
        annotation,
        part_heatmap=None,
        eval_csi: bool = False,
        eval_classif: bool = False,
    ):
        """Accumulate one image (evaluator.py:226-242). `part_heatmap` is
        the decoder's raw (pre-grouping) conf-filtered part keypoints."""
        self.anchor_eval += self.eval_anchor(prediction, annotation)
        if part_heatmap is not None:
            self.part_eval += self.eval_part(annotation, part_heatmap)
        if eval_csi:
            self.csi_eval += self.eval_csi(prediction, annotation)
        if eval_classif:
            self.classification_eval += self.eval_classif(prediction, annotation)

    # -- metric families ------------------------------------------------

    def _resize_pair(self, prediction, annotation):
        img_size = annotation.img_size
        net_size = (self.config.width, self.config.height)
        return (
            prediction.resized(net_size, img_size),
            annotation.resized(net_size, img_size),
            min(img_size) * self.config.dist_threshold,
            img_size,
        )

    def eval_anchor(self, prediction, annotation) -> Evaluations:
        prediction, annotation, dist_thresh, img_size = self._resize_pair(
            prediction, annotation
        )
        preds = dict_grouping(prediction.objects, key=lambda o: o.name)
        gts = dict_grouping(annotation.objects, key=lambda o: o.name)

        result = Evaluations(self.labels)
        for label in self.labels:
            res = _greedy_match(
                preds.get(label, []),
                gts.get(label, []),
                dist_thresh,
                result[label],
                score_key=lambda o: o.anchor.score,
                dist_fn=lambda a, b: a.distance(b),
            )
            res.acc = [d / min(img_size) for d in res.acc]
        return result

    def eval_part(self, annotation, part_heatmap) -> Evaluations:
        """Part localization on raw pre-grouping detections
        (evaluator.py:286-334)."""
        img_size = annotation.img_size
        net_size = (self.config.width, self.config.height)
        annotation = annotation.resized(net_size, img_size)
        preds_kps = [kp.resized(net_size, img_size) for kp in part_heatmap]
        dist_thresh = min(img_size) * self.config.dist_threshold

        preds = dict_grouping(preds_kps, key=lambda kp: kp.kind)
        gts = dict_grouping(
            (kp for obj in annotation.objects for kp in obj.parts),
            key=lambda kp: kp.kind,
        )

        result = Evaluations(self.kp_labels)
        for label in self.kp_labels:
            res = _greedy_match(
                preds.get(label, []),
                gts.get(label, []),
                dist_thresh,
                result[label],
                score_key=lambda kp: kp.score,
                dist_fn=lambda a, b: a.distance(b),
            )
            res.acc = [d / min(img_size) for d in res.acc]
        return result

    def eval_part_grouped(self, prediction, annotation) -> Evaluations:
        """Variant using only parts that survived grouping (the
        reference's disabled `eval_part_2`, evaluator.py:336-378)."""
        prediction, annotation, dist_thresh, img_size = self._resize_pair(
            prediction, annotation
        )
        preds = dict_grouping(
            (p for o in prediction.objects for p in o.parts), key=lambda p: p.kind
        )
        gts = dict_grouping(
            (p for o in annotation.objects for p in o.parts), key=lambda p: p.kind
        )
        result = Evaluations(self.kp_labels)
        for label in self.kp_labels:
            res = _greedy_match(
                preds.get(label, []),
                gts.get(label, []),
                dist_thresh,
                result[label],
                score_key=lambda kp: kp.score,
                dist_fn=lambda a, b: a.distance(b),
            )
            res.acc = [d / min(img_size) for d in res.acc]
        return result

    def eval_csi(self, prediction, annotation) -> Evaluations:
        """Object-level structural CSI (evaluator.py:380-420): greedy by
        best per-pair CSI, TP iff best >= csi_threshold."""
        prediction, annotation, dist_thresh, _ = self._resize_pair(prediction, annotation)
        preds = dict_grouping(prediction.objects, key=lambda o: o.name)
        gts = dict_grouping(annotation.objects, key=lambda o: o.name)

        result = Evaluations(self.labels)
        for label in self.labels:
            res = result[label]
            preds_label = preds.get(label, [])
            gts_label = gts.get(label, [])
            res.ndet = len(preds_label)
            res.npos = len(gts_label)

            preds_label = sorted(preds_label, key=lambda o: o.anchor.score, reverse=True)
            visited = [False] * len(gts_label)
            for pred in preds_label:
                best_csi = 0.0
                idx_best = None
                for j, gt in enumerate(gts_label):
                    csi = Evaluator.compute_csi(pred, gt, dist_thresh)
                    if csi > best_csi:
                        best_csi = csi
                        idx_best = j
                if (
                    idx_best is not None
                    and best_csi >= self.config.csi_threshold
                    and not visited[idx_best]
                ):
                    visited[idx_best] = True
                    res.tp += 1
                    res.acc.append(best_csi)
        return result

    def eval_classif(self, prediction, annotation) -> Evaluations:
        """Composite-label classification: objects bucketed by
        "{label}_{nb_parts}" (evaluator.py:429-474)."""
        prediction, annotation, dist_thresh, img_size = self._resize_pair(
            prediction, annotation
        )
        key = lambda o: f"{o.name}_{o.nb_parts}"
        preds = dict_grouping(prediction.objects, key=key)
        gts = dict_grouping(annotation.objects, key=key)

        labels = self.get_classification_labels()
        result = Evaluations(labels)
        for label in labels:
            res = result[label]
            preds_label = preds.get(label, [])
            gts_label = gts.get(label, [])
            res.ndet = len(preds_label)
            res.npos = len(gts_label)

            preds_label = sorted(preds_label, key=lambda o: o.anchor.score, reverse=True)
            visited = [False] * len(gts_label)
            for pred in preds_label:
                best_dist = sys.float_info.max
                idx_best = None
                for i, gt in enumerate(gts_label):
                    d = pred.distance(gt)
                    if d < best_dist:
                        best_dist = d
                        idx_best = i
                # NOTE: <= here (the reference uses <= for classif,
                # evaluator.py:469, vs < elsewhere)
                if idx_best is not None and best_dist <= dist_thresh and not visited[idx_best]:
                    visited[idx_best] = True
                    res.tp += 1
                    res.acc.append(best_dist / min(img_size))
        return result

    def eval_classif_strict(self, prediction, annotation) -> Evaluations:
        """Stricter classification variant (the reference's unused
        `eval_classif_2`, evaluator.py:476-536): match against *all* GT
        objects by distance regardless of bucket, require the label to
        agree, and record part-count confusion pairs in `count_errors`
        (feeding `Evaluation.save_conf_matrix`). TP only when the part
        count also agrees."""
        prediction, annotation, dist_thresh, img_size = self._resize_pair(
            prediction, annotation
        )
        key = lambda o: f"{o.name}_{o.nb_parts}"
        preds = dict_grouping(prediction.objects, key=key)
        gts_by_label = dict_grouping(annotation.objects, key=key)
        gts = annotation.objects
        visited = [False] * len(gts)

        labels = self.get_classification_labels()
        result = Evaluations(labels)
        for label in labels:
            res = result[label]
            preds_label = preds.get(label, [])
            res.ndet = len(preds_label)
            res.npos = len(gts_by_label.get(label, []))

            preds_label = sorted(preds_label, key=lambda o: o.anchor.score, reverse=True)
            for pred in preds_label:
                best_dist = sys.float_info.max
                idx_best = None
                for i, gt in enumerate(gts):
                    d = pred.distance(gt)
                    if d < best_dist:
                        best_dist = d
                        idx_best = i
                if (
                    idx_best is None
                    or best_dist > dist_thresh
                    or visited[idx_best]
                    or pred.name not in gts[idx_best].name
                ):
                    continue
                if pred.nb_parts != gts[idx_best].nb_parts:
                    res.count_errors.append(
                        (pred.name, pred.nb_parts, gts[idx_best].nb_parts)
                    )
                    continue
                visited[idx_best] = True
                res.tp += 1
                res.acc.append(best_dist / min(img_size))
                res.count_errors.append(
                    (pred.name, pred.nb_parts, gts[idx_best].nb_parts)
                )
        return result

    @staticmethod
    def compute_csi(prediction, target, dist_thresh) -> float:
        """Structural CSI of one predicted/GT object pair
        (evaluator.py:538-581): anchor counts 1/1, then per-kind greedy
        part matching; csi = tp / (npos + ndet - tp)."""
        if prediction.name != target.name:
            return 0.0

        preds_kp = dict_grouping(prediction.parts, key=lambda kp: kp.kind)
        gts_kp = dict_grouping(target.parts, key=lambda kp: kp.kind)

        e = Evaluation()
        e.npos += 1
        e.ndet += 1
        e.tp += int(
            prediction.distance(target) < dist_thresh and prediction.name == target.name
        )

        for kind in gts_kp.keys() | preds_kp.keys():
            preds_label = sorted(
                preds_kp.get(kind, []), key=lambda kp: kp.score, reverse=True
            )
            gts_label = gts_kp.get(kind, [])
            e.npos += len(gts_label)
            e.ndet += len(preds_label)

            visited = [False] * len(gts_label)
            for pred_kp in preds_label:
                min_dist = sys.float_info.max
                j_min = None
                for j, gt_kp in enumerate(gts_label):
                    d = pred_kp.distance(gt_kp)
                    if d < min_dist:
                        min_dist = d
                        j_min = j
                if min_dist < dist_thresh and not visited[j_min]:
                    visited[j_min] = True
                    e.tp += 1
        return e.csi

    # -- reporting ------------------------------------------------------

    def _result_tables(self):
        return {
            "Anchor Location": self.anchor_eval,
            "Part Location": self.part_eval,
            "All Kps Location": self.kps_eval,
            "CSI": self.csi_eval,
            "Classification": self.classification_eval,
        }

    def pretty_print(self):
        from rich import print as rprint
        from rich.table import Column, Table

        for title, evals in self._result_tables().items():
            table = Table(Column("Label", style="bold"), *Evaluation.columns(), title=title)
            for label, e in evals.items():
                table.add_row(label, *e.stats())
            if len(evals) > 1:
                table.add_row("Total", *evals.reduce().stats(), style="bold")
            rprint(table)

    def _csv_kps_str(self) -> str:
        content = []
        evals = self.kps_eval
        for label in sorted(evals.labels):
            e = evals[label]
            content.append(
                ",".join(
                    (label, str(e.recall), str(e.precision), str(e.f1_score), str(e.avg_acc))
                )
            )
        return "\n".join(content)

    def save_kps_csv(self, path: Path):
        Path(path).write_text(self._csv_kps_str())

    def scalar_summary(self) -> Dict[str, float]:
        """Flat metric dict for logging (the trainer's TB scalars,
        trainer.py:173-223)."""
        out = {}
        for name, evals in (
            ("anchor", self.anchor_eval),
            ("part", self.part_eval),
            ("kps", self.kps_eval),
            ("csi", self.csi_eval),
            ("classif", self.classification_eval),
        ):
            total = evals.reduce()
            out[f"{name}/f1_total"] = total.f1_score
            out[f"{name}/precision_total"] = total.precision
            out[f"{name}/recall_total"] = total.recall
            for label, e in evals.items():
                if e.npos or e.ndet:
                    out[f"{name}/f1_{label}"] = e.f1_score
        return out

    def __repr__(self):
        desc = ""
        for name, evals in self._result_tables().items():
            desc += f"{name}\n"
            if len(evals) > 1:
                desc += f"  total: {evals.reduce()}\n"
            for label, e in sorted(evals.items(), key=lambda t: t[0]):
                desc += f"  {label}: {e}\n"
        return desc
