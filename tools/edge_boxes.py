"""Edge-boxes proposal extraction (host-side, OpenCV-free).

The reference exposes an edge-boxes op via ``tf.py_func`` wrapping
``cv2.ximgproc.createEdgeBoxes`` (reference core/imgproc.py:31-67,
154-190); it is vestigial there (no in-repo caller outside its test).
This is a self-contained numpy approximation of Zitnick & Dollar's
scoring — Sobel edge magnitude instead of the structured-forest edge
detector, connected edge groups, and the fully-enclosed-group score
normalized by box perimeter — kept as an offline tool in the same spirit
as the selective-search extractor (proposals -> normalized
[ymin, xmin, ymax, xmax] float32 .npy).

Usage:
  python tools/edge_boxes.py --image photo.jpg --output boxes.npy \
      [--max_boxes 500]
"""

from __future__ import annotations

import argparse

import numpy as np


def _sobel(gray):
    gray = gray.astype(np.float32)
    padded = np.pad(gray, 1, mode="edge")
    gx = (
        padded[1:-1, 2:] - padded[1:-1, :-2]
        + 0.5 * (padded[:-2, 2:] - padded[:-2, :-2])
        + 0.5 * (padded[2:, 2:] - padded[2:, :-2])
    )
    gy = (
        padded[2:, 1:-1] - padded[:-2, 1:-1]
        + 0.5 * (padded[2:, 2:] - padded[:-2, 2:])
        + 0.5 * (padded[2:, :-2] - padded[:-2, :-2])
    )
    return np.hypot(gx, gy)


def _edge_groups(mag, threshold):
    """8-connected components over thresholded edge pixels (iterative
    flood fill; returns a label map with -1 for non-edges)."""
    h, w = mag.shape
    edge = mag > threshold
    labels = np.full((h, w), -1, np.int32)
    next_label = 0
    stack = []
    for sy in range(h):
        for sx in range(w):
            if not edge[sy, sx] or labels[sy, sx] != -1:
                continue
            stack.append((sy, sx))
            labels[sy, sx] = next_label
            while stack:
                y, x = stack.pop()
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = y + dy, x + dx
                        if (
                            0 <= ny < h and 0 <= nx < w
                            and edge[ny, nx] and labels[ny, nx] == -1
                        ):
                            labels[ny, nx] = next_label
                            stack.append((ny, nx))
            next_label += 1
    return labels, next_label


def _group_stats(mag, labels, num_groups):
    """Per-group magnitude sum and bounding box."""
    sums = np.zeros(num_groups, np.float64)
    y0 = np.full(num_groups, np.inf)
    x0 = np.full(num_groups, np.inf)
    y1 = np.full(num_groups, -np.inf)
    x1 = np.full(num_groups, -np.inf)
    ys, xs = np.nonzero(labels >= 0)
    ls = labels[ys, xs]
    np.add.at(sums, ls, mag[ys, xs])
    np.minimum.at(y0, ls, ys)
    np.minimum.at(x0, ls, xs)
    np.maximum.at(y1, ls, ys)
    np.maximum.at(x1, ls, xs)
    return sums, np.stack([y0, x0, y1 + 1, x1 + 1], axis=-1)


def _candidate_boxes(h, w, min_side=16, scale_step=1.3,
                     aspects=(0.4, 0.6, 0.8, 1.0, 1.3, 1.7, 2.5),
                     overlap=0.8):
    """Sliding-window candidates over scales and aspect ratios."""
    def _positions(extent, size, step):
        last = int(extent - size)
        pos = list(range(0, last + 1, max(1, step)))
        if pos[-1] != last:
            pos.append(last)  # always include the boundary placement
        return pos

    out = []
    side = float(min_side)
    while side <= max(h, w):
        for aspect in aspects:
            bh = side * np.sqrt(aspect)
            bw = side / np.sqrt(aspect)
            if bh > h or bw > w:
                continue
            sy = int(bh * (1 - overlap))
            sx = int(bw * (1 - overlap))
            for y in _positions(h, bh, sy):
                for x in _positions(w, bw, sx):
                    out.append((y, x, y + bh, x + bw))
        side *= scale_step
    return np.array(out, np.float32).reshape(-1, 4)


def _score_boxes(boxes, group_sums, group_boxes, kappa=1.5):
    """Sum of magnitudes of groups fully inside the box, normalized by
    perimeter^kappa (straddling groups contribute zero, the w_b=0
    simplification of the original affinity chain)."""
    inside = (
        (group_boxes[None, :, 0] >= boxes[:, None, 0])
        & (group_boxes[None, :, 1] >= boxes[:, None, 1])
        & (group_boxes[None, :, 2] <= boxes[:, None, 2])
        & (group_boxes[None, :, 3] <= boxes[:, None, 3])
    )
    totals = inside @ group_sums
    perim = 2 * (
        (boxes[:, 2] - boxes[:, 0]) + (boxes[:, 3] - boxes[:, 1])
    )
    return totals / np.power(perim, kappa)


def _nms(boxes, scores, iou_threshold=0.8, max_out=2000, pre_nms_top=5000):
    """Greedy NMS over the top-`pre_nms_top` candidates with a vectorized
    suppression mask (the per-pair Python loop was O(N * keep))."""
    order = np.argsort(-scores, kind="stable")
    order = order[scores[order] > 0][:pre_nms_top]
    if len(order) == 0:
        return np.zeros((0,), np.int64)
    b = boxes[order].astype(np.float64)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    alive = np.ones(len(order), bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        if len(keep) >= max_out:
            break
        iy = np.maximum(
            0.0, np.minimum(b[i, 2], b[:, 2]) - np.maximum(b[i, 0], b[:, 0])
        )
        ix = np.maximum(
            0.0, np.minimum(b[i, 3], b[:, 3]) - np.maximum(b[i, 1], b[:, 1])
        )
        inter = iy * ix
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        alive &= iou <= iou_threshold
        alive[i] = False
    return np.asarray(keep, np.int64)


def get_edge_boxes(image, max_boxes=500, edge_threshold=None, min_side=16,
                   work_max_dim=400):
    """Returns ([N,4] normalized [ymin,xmin,ymax,xmax], [N] scores).

    The image is downscaled so max(H, W) <= work_max_dim before edge
    analysis (outputs are normalized, so coordinates are unaffected):
    the Python flood fill and the [candidates x groups] containment
    matrix are quadratic in resolution, and proposal quality at this
    scale matches the reference tool's defaults.
    """
    image = np.asarray(image)
    gray = image.mean(axis=-1) if image.ndim == 3 else image
    scale = work_max_dim / max(gray.shape)
    if scale < 1.0:
        import cv2

        gray = cv2.resize(
            gray.astype(np.float32),
            (max(1, int(round(gray.shape[1] * scale))),
             max(1, int(round(gray.shape[0] * scale)))),
            interpolation=cv2.INTER_AREA,
        )
    mag = _sobel(gray)
    if edge_threshold is None:
        edge_threshold = max(float(np.percentile(mag, 90)), 1e-3)
    labels, num_groups = _edge_groups(mag, edge_threshold)
    if num_groups == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
    sums, gboxes = _group_stats(mag, labels, num_groups)
    # Keep only the strongest groups: noise specks add nothing to any
    # box's ranking but blow up the [candidates x groups] containment
    # matrix (and real object boundaries dominate the magnitude sums).
    max_groups = 512
    if len(sums) > max_groups:
        top = np.argsort(-sums, kind="stable")[:max_groups]
        sums, gboxes = sums[top], gboxes[top]
    h, w = gray.shape
    cands = _candidate_boxes(h, w, min_side=min_side)
    scores = _score_boxes(cands, sums, gboxes)
    keep = _nms(cands, scores, max_out=max_boxes)
    boxes = _tighten(cands[keep], sums, gboxes)
    kept_scores = scores[keep]
    # Tightening can snap distinct candidates onto the same group bbox;
    # drop exact duplicates (keep the best-scored instance).
    _, first = np.unique(boxes, axis=0, return_index=True)
    first = np.sort(first)
    boxes, kept_scores = boxes[first], kept_scores[first]
    order = np.argsort(-kept_scores, kind="stable")
    boxes, kept_scores = boxes[order], kept_scores[order]
    boxes = boxes / np.array([h, w, h, w], np.float32)
    return boxes.astype(np.float32), kept_scores.astype(np.float32)


def _tighten(boxes, group_sums, group_boxes, min_share=0.05):
    """Snaps each box to the bounding box of its dominant contained edge
    groups (the sliding grid only guarantees containment, not tightness)."""
    out = boxes.copy()
    for i, box in enumerate(boxes):
        inside = (
            (group_boxes[:, 0] >= box[0]) & (group_boxes[:, 1] >= box[1])
            & (group_boxes[:, 2] <= box[2]) & (group_boxes[:, 3] <= box[3])
        )
        if not inside.any():
            continue
        sums = group_sums * inside
        strong = sums >= min_share * sums.sum()
        if not strong.any():
            continue
        gb = group_boxes[strong]
        out[i] = (gb[:, 0].min(), gb[:, 1].min(), gb[:, 2].max(),
                  gb[:, 3].max())
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--max_boxes", type=int, default=500)
    args = parser.parse_args()

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    boxes, _ = get_edge_boxes(image, max_boxes=args.max_boxes)
    np.save(args.output, boxes)
    print("wrote %d boxes to %s" % (len(boxes), args.output))


if __name__ == "__main__":
    main()
