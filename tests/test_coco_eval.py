"""COCO-protocol evaluator: hand-computed AP/AR goldens + dispatch.

Protocol reference: the object_detection ``CocoDetectionEvaluator`` the
reference selects via ``--evaluator coco`` (train/predict.py:565-576).
"""

import numpy as np
import pytest

from cap2det_tpu.eval.coco_eval import CocoDetectionEvaluator

CATS = [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}]


def _eval_single(gt_boxes, gt_classes, det_boxes, det_scores, det_classes,
                 cats=CATS):
    ev = CocoDetectionEvaluator(cats)
    ev.add_single_ground_truth_image_info(
        "img0",
        {"groundtruth_boxes": gt_boxes, "groundtruth_classes": gt_classes},
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": det_boxes,
            "detection_scores": det_scores,
            "detection_classes": det_classes,
        },
    )
    return ev.evaluate()


def test_perfect_detection_all_ones():
    gt = [[0.0, 0.0, 100.0, 100.0]]
    res = _eval_single(gt, [1], gt, [0.9], [1])
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Precision/mAP@.50IOU"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Precision/mAP@.75IOU"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Recall/AR@1"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)
    # 100x100 box is large; the other splits have no gt.
    assert res["DetectionBoxes_Precision/mAP (large)"] == pytest.approx(1.0)
    assert np.isnan(res["DetectionBoxes_Precision/mAP (small)"])
    assert np.isnan(res["DetectionBoxes_Precision/mAP (medium)"])


def test_graded_iou_counts_thresholds():
    # det IoU vs gt = 0.62: TP at IoU thresholds .50/.55/.60, FP above.
    gt = [[0.0, 0.0, 100.0, 100.0]]
    det = [[0.0, 0.0, 100.0, 62.0]]
    res = _eval_single(gt, [1], det, [0.9], [1])
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(0.3)
    assert res["DetectionBoxes_Precision/mAP@.50IOU"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Precision/mAP@.75IOU"] == pytest.approx(0.0)
    assert res["DetectionBoxes_Recall/AR@100"] == pytest.approx(0.3)


def test_fp_ranked_above_tp_halves_ap():
    gt = [[0.0, 0.0, 100.0, 100.0]]
    det = [[200.0, 200.0, 300.0, 300.0], [0.0, 0.0, 100.0, 100.0]]
    res = _eval_single(gt, [1], det, [0.9, 0.8], [1, 1])
    # Precision envelope: 0.5 at every one of the 101 recall points.
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(0.5)
    # The single top-scoring detection is the FP.
    assert res["DetectionBoxes_Recall/AR@1"] == pytest.approx(0.0)
    assert res["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)


def test_unmatched_gt_takes_the_match():
    """COCO matching: a detection takes the best *unmatched* gt, unlike the
    VOC matcher which fails if its argmax gt is already matched."""
    # Two identical overlapping gts; two identical perfect detections.
    gt = [[0.0, 0.0, 100.0, 100.0], [0.0, 0.0, 100.0, 100.0]]
    det = [[0.0, 0.0, 100.0, 100.0], [0.0, 0.0, 100.0, 100.0]]
    res = _eval_single(gt, [1, 1], det, [0.9, 0.8], [1, 1])
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)


def test_area_splits_ignore_out_of_range():
    # One small (20x20=400 px^2) and one large (200x200) gt, both matched.
    gt = [[0.0, 0.0, 20.0, 20.0], [300.0, 300.0, 500.0, 500.0]]
    det = list(gt)
    res = _eval_single(gt, [1, 1], det, [0.9, 0.8], [1, 1])
    assert res["DetectionBoxes_Precision/mAP (small)"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Precision/mAP (large)"] == pytest.approx(1.0)
    assert np.isnan(res["DetectionBoxes_Precision/mAP (medium)"])
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)

    # Miss the small one: overall recall drops, large split stays perfect.
    res = _eval_single(gt, [1, 1], [gt[1]], [0.9], [1])
    assert res["DetectionBoxes_Precision/mAP (large)"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Precision/mAP (small)"] == pytest.approx(0.0)
    # Half the gts found with no FPs: envelope precision 1 up to recall .5.
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(
        np.mean(np.linspace(0, 1, 101) <= 0.5)
    )


def test_class_averaging_and_missing_class():
    gt = [[0.0, 0.0, 100.0, 100.0]]
    # cat perfect; dog has a detection but no gt -> dog excluded from mean.
    ev = CocoDetectionEvaluator(CATS)
    ev.add_single_ground_truth_image_info(
        "img0", {"groundtruth_boxes": gt, "groundtruth_classes": [1]}
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": gt + [[0.0, 0.0, 50.0, 50.0]],
            "detection_scores": [0.9, 0.8],
            "detection_classes": [1, 2],
        },
    )
    res = ev.evaluate()
    assert res["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)


def test_ar_at_k_truncates_detections():
    # Two gts; detections ranked FP, TP, TP.
    gt = [[0.0, 0.0, 100.0, 100.0], [200.0, 0.0, 300.0, 100.0]]
    det = [[400.0, 400.0, 500.0, 500.0]] + gt
    res = _eval_single(gt, [1, 1], det, [0.9, 0.8, 0.7], [1, 1, 1])
    assert res["DetectionBoxes_Recall/AR@1"] == pytest.approx(0.0)
    assert res["DetectionBoxes_Recall/AR@10"] == pytest.approx(1.0)
    assert res["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)


def test_evaluator_dispatch():
    from cap2det_tpu.eval import evaluator as evaluator_lib
    from cap2det_tpu.eval import voc_eval

    class _FakeOptions:
        oicr_iterations = 2

    class _FakeExtractor:
        classes = ["cat", "dog"]

    class _FakeModel:
        options = _FakeOptions()
        label_extractor = _FakeExtractor()

    evs, cats = evaluator_lib.build_detection_evaluators(
        _FakeModel(), evaluator_kind="coco"
    )
    assert len(evs) == 3
    assert all(isinstance(e, CocoDetectionEvaluator) for e in evs)
    evs, _ = evaluator_lib.build_detection_evaluators(
        _FakeModel(), evaluator_kind="pascal"
    )
    assert all(isinstance(e, voc_eval.PascalDetectionEvaluator) for e in evs)
    with pytest.raises(ValueError):
        evaluator_lib.build_detection_evaluators(
            _FakeModel(), evaluator_kind="nope"
        )


def test_vectorized_match_equals_reference_loop():
    """Randomized differential test: the vectorized greedy matcher must
    reproduce the literal pycocotools-semantics triple loop bit for bit
    (including equal-IoU tie handling and the ignored-gt break rule)."""
    from cap2det_tpu.eval.coco_eval import IOU_THRESHOLDS, _match_cached

    def reference_match(iou, gt_ignore):
        nth = len(IOU_THRESHOLDS)
        nd, ng = iou.shape
        matched = np.zeros((nth, nd), bool)
        ignored = np.zeros((nth, nd), bool)
        if nd == 0 or ng == 0:
            return matched, ignored
        order = np.argsort(gt_ignore, kind="stable")
        iou = iou[:, order]
        gt_ignore = gt_ignore[order]
        for ti, thr in enumerate(IOU_THRESHOLDS):
            taken = np.zeros(ng, bool)
            for d in range(nd):
                best, best_iou = -1, min(thr, 1.0 - 1e-10)
                for g in range(ng):
                    if taken[g]:
                        continue
                    if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                        break
                    if iou[d, g] < best_iou:
                        continue
                    best, best_iou = g, iou[d, g]
                if best > -1:
                    taken[best] = True
                    matched[ti, d] = True
                    ignored[ti, d] = gt_ignore[best]
        return matched, ignored

    rng = np.random.RandomState(0)
    for trial in range(50):
        nd = rng.randint(0, 8)
        ng = rng.randint(0, 6)
        # Quantized IoUs make equal-value ties common.
        iou = rng.randint(0, 12, (nd, ng)) / 10.0
        gt_ignore = rng.rand(ng) < 0.4
        got_m, got_i = _match_cached(iou.copy(), gt_ignore.copy())
        want_m, want_i = reference_match(iou, gt_ignore)
        np.testing.assert_array_equal(got_m, want_m, err_msg="trial %d" % trial)
        np.testing.assert_array_equal(got_i, want_i, err_msg="trial %d" % trial)
