"""Visualization helpers: heatmaps, box/caption drawing, base64 JPEG.

Host-side equivalent of the reference core/plotlib.py (:34-473): feeds
the HTML evaluation report (eval/html_report.py) and ad-hoc debugging.
"""

from __future__ import annotations

import base64

import numpy as np


def convert_to_heatmap(values, normalize=True, colormap="jet"):
    """[H, W] float array -> [H, W, 3] uint8 heatmap image."""
    import matplotlib.cm as cm

    v = np.asarray(values, np.float32)
    if normalize:
        vmin, vmax = float(v.min()), float(v.max())
        v = (v - vmin) / max(vmax - vmin, 1e-12)
    rgba = cm.get_cmap(colormap)(np.clip(v, 0, 1))
    return (rgba[..., :3] * 255).astype(np.uint8)


def draw_rectangles(image, boxes, labels=None, color=(255, 0, 0), thickness=2,
                    normalized=True):
    """Draws [N, 4] (ymin, xmin, ymax, xmax) boxes with optional labels."""
    import cv2

    out = np.ascontiguousarray(image).copy()
    h, w = out.shape[:2]
    sy, sx = (h, w) if normalized else (1, 1)
    labels = labels if labels is not None else [None] * len(boxes)
    for box, label in zip(boxes, labels):
        y1, x1, y2, x2 = box
        p1 = (int(x1 * sx), int(y1 * sy))
        p2 = (int(x2 * sx), int(y2 * sy))
        cv2.rectangle(out, p1, p2, color, thickness)
        if label is not None and label != "":
            cv2.putText(
                out, str(label), (p1[0], max(p1[1] - 4, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
            )
    return out


def draw_caption(image, caption, org=(10, 20), color=(255, 255, 255)):
    import cv2

    out = np.ascontiguousarray(image).copy()
    cv2.putText(out, caption, org, cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def to_base64_jpeg(image, quality=90):
    """RGB uint8 image -> base64 JPEG string (for HTML embedding)."""
    import cv2

    ok, buf = cv2.imencode(
        ".jpg", image[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality]
    )
    if not ok:
        raise ValueError("JPEG encoding failed")
    return base64.b64encode(buf.tobytes()).decode("ascii")
