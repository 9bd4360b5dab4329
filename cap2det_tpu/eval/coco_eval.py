"""COCO-protocol detection evaluation: mAP@[.5:.95], area splits, AR@k.

Replaces the object_detection ``CocoDetectionEvaluator`` the reference
selects with ``--evaluator coco`` (train/predict.py:565-576). Pure numpy,
pycocotools semantics:

  * 10 IoU thresholds .50:.05:.95, 101-point interpolated precision,
  * per-(image, class) greedy matching: detections by descending score,
    each takes the highest-IoU *unmatched* ground truth above the
    threshold (unlike the VOC matcher, which fails a detection whose
    argmax ground truth was already taken),
  * area-range splits (small <32^2, medium <96^2, large) where
    out-of-range ground truths are ignored and detections matched to
    them (or unmatched with out-of-range area) don't count as FPs,
  * AP averaged over classes with ground truth; AR@{1,10,100} averaged
    over IoU thresholds.

Same streaming ``add_single_*`` interface as voc_eval so the evaluation
driver can dispatch on a flag. Boxes are [ymin, xmin, ymax, xmax]; pass
absolute pixel coordinates so the area splits are meaningful (with
normalized boxes everything lands in "small" — IoU metrics are still
correct since IoU is scale-invariant).
"""

from __future__ import annotations

import numpy as np

from cap2det_tpu.eval.voc_eval import _iou_matrix

IOU_THRESHOLDS = np.arange(0.5, 0.951, 0.05)
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, float("inf")),
}
MAX_DETS = (1, 10, 100)


def _box_areas(boxes):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, max_det):
    """Per-image, per-class matching for every IoU threshold at once.

    Returns (det_matched [T, D], det_ignore [T, D], scores [D]) for the
    top-`max_det` detections, plus the number of non-ignored gts.
    """
    order = np.argsort(-det_scores, kind="stable")[:max_det]
    det_boxes = det_boxes[order]
    scores = det_scores[order]
    nth = len(IOU_THRESHOLDS)
    nd, ng = len(det_boxes), len(gt_boxes)
    matched = np.zeros((nth, nd), bool)
    ignored = np.zeros((nth, nd), bool)
    if nd == 0:
        return matched, ignored, scores
    if ng == 0:
        return matched, ignored, scores

    # Evaluate non-ignored gts first (pycocotools sorts gts by ignore flag).
    gt_order = np.argsort(gt_ignore, kind="stable")
    gt_boxes = gt_boxes[gt_order]
    gt_ignore = gt_ignore[gt_order]
    iou = _iou_matrix(det_boxes, gt_boxes)

    for ti, thr in enumerate(IOU_THRESHOLDS):
        taken = np.zeros(ng, bool)
        for d in range(nd):
            best, best_iou = -1, min(thr, 1.0 - 1e-10)
            for g in range(ng):
                if taken[g]:
                    continue
                # Once we hold a real match, never downgrade to ignored gts.
                if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                    break
                if iou[d, g] < best_iou:
                    continue
                best, best_iou = g, iou[d, g]
            if best > -1:
                taken[best] = True
                matched[ti, d] = True
                ignored[ti, d] = gt_ignore[best]
    return matched, ignored, scores


class CocoDetectionEvaluator:
    """Streaming COCO-style evaluator (od-compatible metric key names)."""

    def __init__(self, categories, metric_prefix="DetectionBoxes"):
        self._categories = list(categories)
        self._prefix = metric_prefix
        self._gt = {}  # image_id -> {cid: boxes}
        self._det = {}  # image_id -> {cid: (boxes, scores)}

    def clear(self):
        self._gt.clear()
        self._det.clear()

    def add_single_ground_truth_image_info(self, image_id, info):
        boxes = np.asarray(info["groundtruth_boxes"], np.float64).reshape(-1, 4)
        classes = np.asarray(info["groundtruth_classes"], np.int64).reshape(-1)
        per_class = {}
        for cid in np.unique(classes):
            per_class[int(cid)] = boxes[classes == cid]
        self._gt[image_id] = per_class

    def add_single_detected_image_info(self, image_id, info):
        boxes = np.asarray(info["detection_boxes"], np.float64).reshape(-1, 4)
        scores = np.asarray(info["detection_scores"], np.float64).reshape(-1)
        classes = np.asarray(info["detection_classes"], np.int64).reshape(-1)
        per_class = {}
        for cid in np.unique(classes):
            sel = classes == cid
            per_class[int(cid)] = (boxes[sel], scores[sel])
        self._det[image_id] = per_class

    def _accumulate_class(self, cid, area_range, max_det):
        """Returns (precision [T, R], recall [T]) or None if no gt."""
        lo, hi = AREA_RANGES[area_range]
        image_ids = sorted(set(self._gt) | set(self._det), key=str)
        all_scores, all_matched, all_ignored = [], [], []
        num_gt = 0
        for image_id in image_ids:
            gt_boxes = self._gt.get(image_id, {}).get(cid)
            gt_boxes = (
                np.zeros((0, 4)) if gt_boxes is None else gt_boxes
            )
            det_boxes, det_scores = self._det.get(image_id, {}).get(
                cid, (np.zeros((0, 4)), np.zeros(0))
            )
            gt_area = _box_areas(gt_boxes)
            gt_ignore = (gt_area < lo) | (gt_area > hi)
            num_gt += int((~gt_ignore).sum())
            matched, ignored, scores = _match_image(
                det_boxes, det_scores, gt_boxes, gt_ignore, max_det
            )
            # Unmatched detections with out-of-range area are ignored too.
            order = np.argsort(-det_scores, kind="stable")[:max_det]
            det_area = _box_areas(det_boxes[order])
            out_of_range = (det_area < lo) | (det_area > hi)
            ignored = ignored | (~matched & out_of_range[None, :])
            all_scores.append(scores)
            all_matched.append(matched)
            all_ignored.append(ignored)

        if num_gt == 0:
            return None
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        matched = (
            np.concatenate(all_matched, axis=1)
            if all_matched
            else np.zeros((len(IOU_THRESHOLDS), 0), bool)
        )
        ignored = (
            np.concatenate(all_ignored, axis=1)
            if all_ignored
            else np.zeros((len(IOU_THRESHOLDS), 0), bool)
        )
        order = np.argsort(-scores, kind="stable")
        matched = matched[:, order]
        ignored = ignored[:, order]

        nth = len(IOU_THRESHOLDS)
        precision = np.zeros((nth, len(RECALL_THRESHOLDS)))
        recall = np.zeros(nth)
        for ti in range(nth):
            keep = ~ignored[ti]
            tp = np.cumsum(matched[ti][keep] & ~ignored[ti][keep])
            fp = np.cumsum(~matched[ti][keep])
            rc = tp / num_gt
            pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
            recall[ti] = rc[-1] if len(rc) else 0.0
            # Monotone envelope then sample at the 101 recall points.
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            inds = np.searchsorted(rc, RECALL_THRESHOLDS, side="left")
            precision[ti] = np.where(
                inds < len(pr), pr[np.minimum(inds, max(len(pr) - 1, 0))], 0.0
            ) if len(pr) else 0.0
        return precision, recall

    def evaluate(self):
        """Returns {metric_name: value} (od CocoDetectionEvaluator names)."""
        # AP splits at maxDet=100; AR at each maxDet.
        ap_acc = {rng: [] for rng in AREA_RANGES}
        ap50, ap75 = [], []
        ar_acc = {k: [] for k in MAX_DETS}
        ar_area = {rng: [] for rng in ("small", "medium", "large")}
        for cat in self._categories:
            cid = cat["id"]
            for rng in AREA_RANGES:
                out = self._accumulate_class(cid, rng, 100)
                if out is None:
                    continue
                precision, recall = out
                ap_acc[rng].append(precision.mean())
                if rng == "all":
                    ap50.append(precision[0].mean())
                    ap75.append(precision[5].mean())
                    ar_acc[100].append(recall.mean())
                else:
                    ar_area[rng].append(recall.mean())
            for k in (1, 10):
                out = self._accumulate_class(cid, "all", k)
                if out is not None:
                    ar_acc[k].append(out[1].mean())

        def mean(vals):
            return float(np.mean(vals)) if vals else float("nan")

        p = self._prefix
        return {
            "%s_Precision/mAP" % p: mean(ap_acc["all"]),
            "%s_Precision/mAP@.50IOU" % p: mean(ap50),
            "%s_Precision/mAP@.75IOU" % p: mean(ap75),
            "%s_Precision/mAP (small)" % p: mean(ap_acc["small"]),
            "%s_Precision/mAP (medium)" % p: mean(ap_acc["medium"]),
            "%s_Precision/mAP (large)" % p: mean(ap_acc["large"]),
            "%s_Recall/AR@1" % p: mean(ar_acc[1]),
            "%s_Recall/AR@10" % p: mean(ar_acc[10]),
            "%s_Recall/AR@100" % p: mean(ar_acc[100]),
            "%s_Recall/AR@100 (small)" % p: mean(ar_area["small"]),
            "%s_Recall/AR@100 (medium)" % p: mean(ar_area["medium"]),
            "%s_Recall/AR@100 (large)" % p: mean(ar_area["large"]),
        }
