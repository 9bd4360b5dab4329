"""Randomized cross-check of eval/voc_eval.py and eval/coco_eval.py
against independently-authored brute-force oracles.

The repo's own evaluators replace object_detection's
PascalDetectionEvaluator / pycocotools (reference train/predict.py:565-576)
but were previously verified only on small hand-computed goldens. The VOC
AP protocol has sharp edges — interpolation convention, the
argmax-then-matched greedy (a detection whose best gt is taken is a FP
even if another gt would match), difficult-box ignores, score ties,
duplicate detections — that few-box goldens don't span. These oracles are
deliberately naive (scalar loops, no vectorization, no shared helpers
with the production code; the COCO oracle transcribes the published
pycocotools evaluateImg/accumulate semantics directly) so that any
protocol slip in the fast implementations surfaces as a counter-example
scene here.

~200 randomized scenes per protocol, with forced score ties, duplicate
detections, duplicate ground-truth boxes, difficult flags, empty images,
det-only and gt-only images.
"""

import numpy as np
import pytest

from cap2det_tpu.eval import coco_eval, voc_eval


# ---------------------------------------------------------------------------
# shared scalar helpers (oracle-side, written from the box-geometry spec)
# ---------------------------------------------------------------------------

def _iou(a, b):
    ay0, ax0, ay1, ax1 = a
    by0, bx0, by1, bx1 = b
    ih = min(ay1, by1) - max(ay0, by0)
    iw = min(ax1, bx1) - max(ax0, bx0)
    if ih <= 0 or iw <= 0:
        return 0.0
    inter = ih * iw
    area_a = max(ay1 - ay0, 0) * max(ax1 - ax0, 0)
    area_b = max(by1 - by0, 0) * max(bx1 - bx0, 0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def _area(b):
    return max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)


def _stable_desc_order(scores):
    """Indices by descending score, original order on ties."""
    return sorted(range(len(scores)), key=lambda i: (-scores[i], i))


# ---------------------------------------------------------------------------
# VOC oracle
# ---------------------------------------------------------------------------

def _voc_oracle_class(scenes, thr):
    """(ap, corloc) for one class.

    scenes: list of dicts with keys gt (list of boxes), difficult (list of
    bool), det (list of boxes), scores (list of float).
    """
    # Global detection list: (score, scene_index, in-scene rank) with the
    # per-scene stable order. Cross-scene ties are excluded by the
    # generator (the protocol's cumulative curve is concat-order-dependent
    # under cross-image ties; see the module docstring of voc_eval).
    flags = []  # (score, is_tp) for kept (non-ignored) detections
    num_gt = 0
    n_img_with_class = 0
    corloc_hits = 0
    for scene in scenes:
        gt = scene["gt"]
        difficult = scene["difficult"]
        det = scene["det"]
        scores = scene["scores"]
        num_easy = sum(1 for d in difficult if not d)
        num_gt += num_easy
        order = _stable_desc_order(scores)
        matched = [False] * len(gt)
        for rank, i in enumerate(order):
            if not gt:
                flags.append((scores[i], False))
                continue
            ious = [_iou(det[i], g) for g in gt]
            best = max(range(len(gt)), key=lambda j: (ious[j], -j))
            if ious[best] >= thr:
                if difficult[best]:
                    continue  # ignored: drops out of the PR curve
                if not matched[best]:
                    matched[best] = True
                    flags.append((scores[i], True))
                else:
                    # argmax gt already taken -> FP, even if another gt
                    # would still match (od greedy semantics).
                    flags.append((scores[i], False))
            else:
                flags.append((scores[i], False))
            if rank == 0 and num_easy > 0:
                if ious[best] >= thr and not difficult[best]:
                    corloc_hits += 1
        if num_easy > 0:
            n_img_with_class += 1

    corloc = (
        corloc_hits / n_img_with_class if n_img_with_class else float("nan")
    )
    if num_gt == 0:
        return float("nan"), corloc
    flags.sort(key=lambda t: -t[0])  # no cross-scene ties by construction
    # Brute-force all-point-interpolated AP: integrate
    # p(r) = max{prec_k : rec_k >= r} over the achieved recall steps.
    prec, rec = [], []
    tp = 0
    for k, (_, is_tp) in enumerate(flags, start=1):
        tp += int(is_tp)
        prec.append(tp / k)
        rec.append(tp / num_gt)
    ap = 0.0
    prev_r = 0.0
    for r in sorted(set(rec)):
        if r == prev_r:
            continue
        p = max(p_k for p_k, r_k in zip(prec, rec) if r_k >= r)
        ap += (r - prev_r) * p
        prev_r = r
    return ap, corloc


def _random_voc_scenes(rs, n_images, n_classes):
    """Randomized gt/det scenes incl. ties, duplicates, difficult flags."""
    per_class = {c: [] for c in range(1, n_classes + 1)}
    gt_infos, det_infos = [], []
    for img in range(n_images):
        gt_boxes, gt_classes, gt_diff = [], [], []
        det_boxes, det_scores, det_classes = [], [], []
        for c in range(1, n_classes + 1):
            scene = {"gt": [], "difficult": [], "det": [], "scores": []}
            n_gt = rs.randint(0, 4)
            for _ in range(n_gt):
                y0, x0 = rs.uniform(0, 150, 2)
                h, w = rs.uniform(8, 120, 2)
                box = (y0, x0, y0 + h, x0 + w)
                scene["gt"].append(box)
                scene["difficult"].append(bool(rs.rand() < 0.25))
                if rs.rand() < 0.2:  # duplicate gt box
                    scene["gt"].append(box)
                    scene["difficult"].append(bool(rs.rand() < 0.25))
            n_det = rs.randint(0, 5)
            for _ in range(n_det):
                if scene["gt"] and rs.rand() < 0.6:
                    # Perturbed copy of a gt box (controllable IoU).
                    g = scene["gt"][rs.randint(len(scene["gt"]))]
                    jit = rs.uniform(-15, 15, 4)
                    box = (g[0] + jit[0], g[1] + jit[1],
                           max(g[0] + jit[0] + 1, g[2] + jit[2]),
                           max(g[1] + jit[1] + 1, g[3] + jit[3]))
                else:
                    y0, x0 = rs.uniform(0, 150, 2)
                    h, w = rs.uniform(8, 120, 2)
                    box = (y0, x0, y0 + h, x0 + w)
                # Unique-per-(image,class) score mass plus forced ties.
                score = round(float(rs.rand()), 6) + img * 1e-9 + c * 1e-10
                scene["det"].append(box)
                scene["scores"].append(score)
                if rs.rand() < 0.3:  # duplicate detection, tied score
                    scene["det"].append(box)
                    scene["scores"].append(score)
                if rs.rand() < 0.2 and scene["scores"]:
                    # Tied score on a DIFFERENT box, same image+class.
                    y0, x0 = rs.uniform(0, 150, 2)
                    scene["det"].append((y0, x0, y0 + 30, x0 + 30))
                    scene["scores"].append(scene["scores"][-1])
            per_class[c].append(scene)
            for b, d in zip(scene["gt"], scene["difficult"]):
                gt_boxes.append(b)
                gt_classes.append(c)
                gt_diff.append(d)
            for b, s in zip(scene["det"], scene["scores"]):
                det_boxes.append(b)
                det_classes.append(c)
                det_scores.append(s)
        gt_infos.append({
            "groundtruth_boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "groundtruth_classes": np.asarray(gt_classes, np.int64),
            "groundtruth_difficult": np.asarray(gt_diff, bool),
        })
        det_infos.append({
            "detection_boxes": np.asarray(det_boxes, np.float64).reshape(-1, 4),
            "detection_scores": np.asarray(det_scores, np.float64),
            "detection_classes": np.asarray(det_classes, np.int64),
        })
    return per_class, gt_infos, det_infos


@pytest.mark.parametrize("trial", range(40))
def test_voc_eval_matches_bruteforce_oracle(trial):
    rs = np.random.RandomState(1000 + trial)
    n_images = rs.randint(2, 7)
    n_classes = rs.randint(1, 4)
    thr = float(rs.choice([0.3, 0.5, 0.75]))
    per_class, gt_infos, det_infos = _random_voc_scenes(
        rs, n_images, n_classes
    )

    categories = [
        {"id": c, "name": "c%d" % c} for c in range(1, n_classes + 1)
    ]
    ev = voc_eval.PascalDetectionEvaluator(
        categories, matching_iou_threshold=thr
    )
    for img in range(n_images):
        ev.add_single_ground_truth_image_info("img%d" % img, gt_infos[img])
        ev.add_single_detected_image_info("img%d" % img, det_infos[img])
    got = ev.evaluate()

    t = int(round(thr * 100)) / 100
    aps, corlocs = [], []
    for c in range(1, n_classes + 1):
        ap, corloc = _voc_oracle_class(per_class[c], thr)
        for name, want in [
            ("PascalBoxes_PerformanceByCategory/AP@%sIOU/c%d" % (t, c), ap),
            ("PascalBoxes_PerformanceByCategory/CorLoc@%sIOU/c%d" % (t, c),
             corloc),
        ]:
            have = got[name]
            if np.isnan(want):
                assert np.isnan(have), (name, have)
            else:
                np.testing.assert_allclose(
                    have, want, atol=1e-6, err_msg=name
                )
        if not np.isnan(ap):
            aps.append(ap)
        if not np.isnan(corloc):
            corlocs.append(corloc)
    want_map = np.mean(aps) if aps else float("nan")
    have_map = got["PascalBoxes_Precision/mAP@%sIOU" % t]
    if np.isnan(want_map):
        assert np.isnan(have_map)
    else:
        np.testing.assert_allclose(have_map, want_map, atol=1e-6)


# ---------------------------------------------------------------------------
# COCO oracle — a direct transcription of the pycocotools
# evaluateImg/accumulate reference semantics, scalar loops throughout.
# ---------------------------------------------------------------------------

_T = [0.5 + 0.05 * i for i in range(10)]
_R = [i / 100.0 for i in range(101)]
_RANGES = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, float("inf")),
}


def _coco_oracle_match_image(gt, det, scores, lo, hi, max_det):
    """pycocotools evaluateImg for one (image, class, area-range, maxDet).

    Returns (kept_scores_order, dtm [T][D], dt_ignore [T][D]).
    """
    order = _stable_desc_order(scores)[:max_det]
    det = [det[i] for i in order]
    dscores = [scores[i] for i in order]
    gt_ig = [(_area(g) < lo or _area(g) > hi) for g in gt]
    # gts sorted ignored-last (stable).
    gorder = sorted(range(len(gt)), key=lambda j: (gt_ig[j], j))
    gt = [gt[j] for j in gorder]
    gt_ig = [gt_ig[j] for j in gorder]

    dtm = [[-1] * len(det) for _ in _T]
    dt_ig = [[False] * len(det) for _ in _T]
    for ti, t in enumerate(_T):
        t = min(t, 1 - 1e-10)
        gtm = [False] * len(gt)
        for di, d in enumerate(det):
            iou_best = t
            m = -1
            for gi, g in enumerate(gt):
                if gtm[gi]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break  # ran past all non-ignored candidates
                v = _iou(d, g)
                if v < iou_best:
                    continue
                iou_best = v  # ties go to the LATEST gt (pycocotools `<`)
                m = gi
            if m == -1:
                continue
            gtm[m] = True
            dtm[ti][di] = m
            dt_ig[ti][di] = gt_ig[m]
        for di, d in enumerate(det):
            if dtm[ti][di] == -1 and (_area(d) < lo or _area(d) > hi):
                dt_ig[ti][di] = True
    num_gt = sum(1 for ig in gt_ig if not ig)
    return dscores, dtm, dt_ig, num_gt


def _coco_oracle_class_range(images, lo, hi, max_det):
    """(ap over 10 thr x 101 pts, ar over 10 thr) or None if no gt."""
    per_img = [
        _coco_oracle_match_image(im["gt"], im["det"], im["scores"],
                                 lo, hi, max_det)
        for im in images
    ]
    num_gt = sum(p[3] for p in per_img)
    if num_gt == 0:
        return None
    ap_per_t, ar_per_t = [], []
    for ti in range(len(_T)):
        entries = []  # (score, matched, ignored) global
        for dscores, dtm, dt_ig, _ in per_img:
            for di, s in enumerate(dscores):
                entries.append((s, dtm[ti][di] >= 0, dt_ig[ti][di]))
        entries.sort(key=lambda e: -e[0])
        tp = fp = 0
        prec, rec = [], []
        for s, matched, ignored in entries:
            if ignored:
                continue
            if matched:
                tp += 1
            else:
                fp += 1
            prec.append(tp / (tp + fp))
            rec.append(tp / num_gt)
        # envelope
        for i in range(len(prec) - 2, -1, -1):
            prec[i] = max(prec[i], prec[i + 1])
        # sample at the 101 recall thresholds (searchsorted left)
        q = []
        for r in _R:
            idx = None
            for k, rk in enumerate(rec):
                if rk >= r:
                    idx = k
                    break
            q.append(prec[idx] if idx is not None else 0.0)
        ap_per_t.append(sum(q) / len(q))
        ar_per_t.append(rec[-1] if rec else 0.0)
    return sum(ap_per_t) / len(ap_per_t), ar_per_t


def _random_coco_scenes(rs, n_images, n_classes):
    per_class = {c: [] for c in range(1, n_classes + 1)}
    gt_infos, det_infos = [], []
    for img in range(n_images):
        gt_boxes, gt_classes = [], []
        det_boxes, det_scores, det_classes = [], [], []
        for c in range(1, n_classes + 1):
            im = {"gt": [], "det": [], "scores": []}
            for _ in range(rs.randint(0, 4)):
                y0, x0 = rs.uniform(0, 150, 2)
                # Mix of small/medium/large areas so the splits matter.
                side = float(rs.choice([10, 25, 60, 130]))
                h = side * rs.uniform(0.7, 1.4)
                w = side * rs.uniform(0.7, 1.4)
                im["gt"].append((y0, x0, y0 + h, x0 + w))
            for _ in range(rs.randint(0, 5)):
                if im["gt"] and rs.rand() < 0.6:
                    g = im["gt"][rs.randint(len(im["gt"]))]
                    jit = rs.uniform(-10, 10, 4)
                    box = (g[0] + jit[0], g[1] + jit[1],
                           max(g[0] + jit[0] + 1, g[2] + jit[2]),
                           max(g[1] + jit[1] + 1, g[3] + jit[3]))
                else:
                    y0, x0 = rs.uniform(0, 150, 2)
                    side = float(rs.choice([12, 30, 70, 120]))
                    box = (y0, x0, y0 + side, x0 + side)
                score = round(float(rs.rand()), 6) + img * 1e-9 + c * 1e-10
                im["det"].append(box)
                im["scores"].append(score)
                if rs.rand() < 0.25:  # duplicate detection, tied score
                    im["det"].append(box)
                    im["scores"].append(score)
            per_class[c].append(im)
            for b in im["gt"]:
                gt_boxes.append(b)
                gt_classes.append(c)
            for b, s in zip(im["det"], im["scores"]):
                det_boxes.append(b)
                det_classes.append(c)
                det_scores.append(s)
        gt_infos.append({
            "groundtruth_boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "groundtruth_classes": np.asarray(gt_classes, np.int64),
        })
        det_infos.append({
            "detection_boxes": np.asarray(det_boxes, np.float64).reshape(-1, 4),
            "detection_scores": np.asarray(det_scores, np.float64),
            "detection_classes": np.asarray(det_classes, np.int64),
        })
    return per_class, gt_infos, det_infos


@pytest.mark.parametrize("trial", range(25))
def test_coco_eval_matches_pycocotools_oracle(trial):
    rs = np.random.RandomState(2000 + trial)
    n_images = rs.randint(2, 5)
    n_classes = rs.randint(1, 4)
    per_class, gt_infos, det_infos = _random_coco_scenes(
        rs, n_images, n_classes
    )

    categories = [
        {"id": c, "name": "c%d" % c} for c in range(1, n_classes + 1)
    ]
    ev = coco_eval.CocoDetectionEvaluator(categories)
    # Image ids deliberately in an order whose str-sort differs from
    # insertion order (the evaluator sorts by str; the oracle is
    # order-insensitive because cross-image score ties are excluded).
    for img in range(n_images):
        ev.add_single_ground_truth_image_info("img%d" % img, gt_infos[img])
        ev.add_single_detected_image_info("img%d" % img, det_infos[img])
    got = ev.evaluate()

    ap_acc = {rng: [] for rng in _RANGES}
    ap50, ap75 = [], []
    ar_acc = {1: [], 10: [], 100: []}
    ar_area = {"small": [], "medium": [], "large": []}
    for c in range(1, n_classes + 1):
        for rng, (lo, hi) in _RANGES.items():
            out = _coco_oracle_class_range(per_class[c], lo, hi, 100)
            if out is None:
                continue
            ap, ar_per_t = out
            ap_acc[rng].append(ap)
            if rng == "all":
                # AP@.50 / AP@.75: per-threshold mean precision.
                per_t = []
                for ti in (0, 5):
                    one = _coco_oracle_class_range_single_t(
                        per_class[c], lo, hi, 100, ti
                    )
                    per_t.append(one)
                ap50.append(per_t[0])
                ap75.append(per_t[1])
                ar_acc[100].append(sum(ar_per_t) / len(ar_per_t))
                for k in (1, 10):
                    outk = _coco_oracle_class_range(per_class[c], lo, hi, k)
                    assert outk is not None
                    _, ar_k = outk
                    ar_acc[k].append(sum(ar_k) / len(ar_k))
            else:
                ar_area[rng].append(sum(ar_per_t) / len(ar_per_t))

    def mean(vals):
        return float(np.mean(vals)) if vals else float("nan")

    want = {
        "DetectionBoxes_Precision/mAP": mean(ap_acc["all"]),
        "DetectionBoxes_Precision/mAP@.50IOU": mean(ap50),
        "DetectionBoxes_Precision/mAP@.75IOU": mean(ap75),
        "DetectionBoxes_Precision/mAP (small)": mean(ap_acc["small"]),
        "DetectionBoxes_Precision/mAP (medium)": mean(ap_acc["medium"]),
        "DetectionBoxes_Precision/mAP (large)": mean(ap_acc["large"]),
        "DetectionBoxes_Recall/AR@1": mean(ar_acc[1]),
        "DetectionBoxes_Recall/AR@10": mean(ar_acc[10]),
        "DetectionBoxes_Recall/AR@100": mean(ar_acc[100]),
        "DetectionBoxes_Recall/AR@100 (small)": mean(ar_area["small"]),
        "DetectionBoxes_Recall/AR@100 (medium)": mean(ar_area["medium"]),
        "DetectionBoxes_Recall/AR@100 (large)": mean(ar_area["large"]),
    }
    for name, w in want.items():
        have = got[name]
        if np.isnan(w):
            assert np.isnan(have), (name, have)
        else:
            np.testing.assert_allclose(have, w, atol=1e-6, err_msg=name)


def _coco_oracle_class_range_single_t(images, lo, hi, max_det, ti):
    """Mean interpolated precision at ONE IoU threshold index."""
    per_img = [
        _coco_oracle_match_image(im["gt"], im["det"], im["scores"],
                                 lo, hi, max_det)
        for im in images
    ]
    num_gt = sum(p[3] for p in per_img)
    assert num_gt > 0
    entries = []
    for dscores, dtm, dt_ig, _ in per_img:
        for di, s in enumerate(dscores):
            entries.append((s, dtm[ti][di] >= 0, dt_ig[ti][di]))
    entries.sort(key=lambda e: -e[0])
    tp = fp = 0
    prec, rec = [], []
    for s, matched, ignored in entries:
        if ignored:
            continue
        if matched:
            tp += 1
        else:
            fp += 1
        prec.append(tp / (tp + fp))
        rec.append(tp / num_gt)
    for i in range(len(prec) - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    q = []
    for r in _R:
        idx = None
        for k, rk in enumerate(rec):
            if rk >= r:
                idx = k
                break
        q.append(prec[idx] if idx is not None else 0.0)
    return sum(q) / len(q)
