"""Edge-boxes tool: proposals cover strong-edged objects.

Covers the reference's vestigial edge-boxes op (core/imgproc.py:31-67,
154-190) via the numpy tool in tools/edge_boxes.py.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)
import edge_boxes  # noqa: E402


def _iou(a, b):
    iy = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ix = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iy * ix
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-12)


def test_boxes_cover_rectangles():
    rng = np.random.default_rng(0)
    image = rng.normal(120, 4, (160, 200, 3)).clip(0, 255).astype(np.uint8)
    gts = [(0.2, 0.15, 0.55, 0.45), (0.55, 0.6, 0.9, 0.95)]
    for (y0, x0, y1, x1) in gts:
        py0, px0, py1, px1 = (
            np.array([y0, x0, y1, x1]) * [160, 200, 160, 200]
        ).astype(int)
        image[py0:py1, px0:px1] = (
            rng.normal(0, 4, (py1 - py0, px1 - px0, 3)) + (220, 60, 60)
        ).clip(0, 255).astype(np.uint8)

    boxes, scores = edge_boxes.get_edge_boxes(image, max_boxes=300)
    assert len(boxes) > 0
    assert np.all(scores[:-1] >= scores[1:] - 1e-9)  # sorted by score
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0
    for gt in gts:
        best = max(_iou(b, gt) for b in boxes)
        assert best >= 0.5, (gt, best)


def test_blank_image_yields_no_boxes():
    image = np.full((80, 80, 3), 77, np.uint8)
    boxes, scores = edge_boxes.get_edge_boxes(image, edge_threshold=10.0)
    assert len(boxes) == 0


def test_cli_writes_npy(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    image = rng.normal(120, 4, (96, 128, 3)).clip(0, 255).astype(np.uint8)
    image[30:70, 40:90] = (230, 230, 40)
    img_path = str(tmp_path / "img.jpg")
    Image.fromarray(image).save(img_path)
    out_path = str(tmp_path / "boxes.npy")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "edge_boxes.py"),
         "--image", img_path, "--output", out_path, "--max_boxes", "50"],
        check=True,
    )
    boxes = np.load(out_path)
    assert boxes.ndim == 2 and boxes.shape[1] == 4 and len(boxes) <= 50
