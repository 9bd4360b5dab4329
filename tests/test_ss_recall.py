"""Selective-search proposal quality: recall@IoU0.5 on rich scenes and a
hand-verified Felzenszwalb golden (VERDICT r1 item 9).

Proposal recall is what drives WSOD mAP end to end — the detector can
only ever output proposal boxes (reference uses OpenCV SS 'quality',
create_coco_selective_search_data.py:105-107). No OpenCV ximgproc is
installed here, so the bar is recall on synthetic scenes with known
ground truth: textured objects on a textured background, the regime SS's
graph segmentation + hierarchical grouping is built for.
"""

import numpy as np
import pytest

from cap2det_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _iou(a, b):
    iy = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ix = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iy * ix
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-12)


def _rich_scene(rng, hw=(240, 320), num_objects=6):
    """Textured objects on a textured background with known gt boxes."""
    h, w = hw
    image = (
        rng.normal(110, 12, (h, w, 3)).clip(0, 255).astype(np.uint8)
    )
    gt = []
    for _ in range(num_objects):
        for _attempt in range(50):
            oh = int(rng.uniform(0.12, 0.35) * h)
            ow = int(rng.uniform(0.12, 0.35) * w)
            y0 = int(rng.uniform(0, h - oh))
            x0 = int(rng.uniform(0, w - ow))
            box = (y0 / h, x0 / w, (y0 + oh) / h, (x0 + ow) / w)
            if all(_iou(box, g) < 0.2 for g in gt):
                break
        color = rng.uniform(0, 255, 3)
        patch = rng.normal(0, 10, (oh, ow, 3)) + color
        image[y0:y0 + oh, x0:x0 + ow] = patch.clip(0, 255).astype(np.uint8)
        gt.append(box)
    return image, np.array(gt, np.float32)


def _recall(proposals, gt, iou=0.5):
    hits = 0
    for g in gt:
        if any(_iou(p, g) >= iou for p in proposals):
            hits += 1
    return hits / len(gt)


@pytest.mark.slow
def test_recall_at_500_and_2000():
    rng = np.random.default_rng(3)
    recalls_500, recalls_2000 = [], []
    for _ in range(6):
        image, gt = _rich_scene(rng)
        props = native.selective_search(image, quality=True, min_box_side=10)
        recalls_500.append(_recall(props[:500], gt))
        recalls_2000.append(_recall(props[:2000], gt))
    r500 = float(np.mean(recalls_500))
    r2000 = float(np.mean(recalls_2000))
    print("SS recall@0.5: top500=%.3f top2000=%.3f" % (r500, r2000))
    # Distinct textured objects on a flat-textured background: SS must
    # recall nearly all of them (reference-quality SS gets ~0.9+ on real
    # images at 2000 proposals; this scene is easier).
    assert r500 >= 0.85, recalls_500
    assert r2000 >= r500
    assert r2000 >= 0.9, recalls_2000


def test_felzenszwalb_golden_partition():
    """Three uniform vertical bands: each band interior (clear of the
    sigma-0.8 pre-blur's boundary strip) is exactly one segment, and the
    three interiors are distinct segments (hand-verifiable semantics:
    zero-weight interior edges merge first; the sharp band boundaries
    exceed tau(C) = Int(C) + k/|C| once components grow)."""
    h, w = 60, 90
    image = np.zeros((h, w, 3), np.uint8)
    image[:, :30] = (30, 30, 30)
    image[:, 30:60] = (128, 128, 128)
    image[:, 60:] = (230, 230, 230)
    labels = native.felzenszwalb(image, k=50.0, min_size=10)
    assert labels.shape == (h, w)
    margin = 4  # blur radius ~3px
    interiors = [
        labels[:, :30 - margin],
        labels[:, 30 + margin:60 - margin],
        labels[:, 60 + margin:],
    ]
    ids = []
    for interior in interiors:
        u = np.unique(interior)
        assert len(u) == 1, u
        ids.append(int(u[0]))
    assert len(set(ids)) == 3


def test_felzenszwalb_k_extremes():
    """k scales the merge tolerance: huge k merges everything into one
    segment; tiny k keeps the sharp-banded image split."""
    h, w = 40, 60
    image = np.full((h, w, 3), 100, np.uint8)
    image[:, 30:] = 160
    one = native.felzenszwalb(image, k=1e6, min_size=10)
    assert len(np.unique(one)) == 1
    split = native.felzenszwalb(image, k=10.0, min_size=10)
    assert len(np.unique(split)) >= 2
    # The two halves' interiors are in different segments.
    assert split[20, 5] != split[20, 55]
