"""Box geometry in normalized [ymin, xmin, ymax, xmax] coordinates.

One jnp implementation serves both the jitted compute path and host-side
evaluation (reference keeps TF and numpy twins: core/box_utils.py).
All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flip_left_right(box):
    """Mirrors boxes horizontally in normalized coordinates."""
    ymin, xmin, ymax, xmax = jnp.moveaxis(box, -1, 0)
    return jnp.stack([ymin, 1.0 - xmax, ymax, 1.0 - xmin], axis=-1)


def area(box):
    ymin, xmin, ymax, xmax = jnp.moveaxis(box, -1, 0)
    return jnp.maximum(xmax - xmin, 0.0) * jnp.maximum(ymax - ymin, 0.0)


def intersect(box1, box2):
    ymin1, xmin1, ymax1, xmax1 = jnp.moveaxis(box1, -1, 0)
    ymin2, xmin2, ymax2, xmax2 = jnp.moveaxis(box2, -1, 0)
    return jnp.stack(
        [
            jnp.maximum(ymin1, ymin2),
            jnp.maximum(xmin1, xmin2),
            jnp.minimum(ymax1, ymax2),
            jnp.minimum(xmax1, xmax2),
        ],
        axis=-1,
    )


def iou(box1, box2):
    """Elementwise IoU between equal-shaped box arrays (division matches the
    reference exactly, including 0/0 -> nan for two empty boxes)."""
    inter = area(intersect(box1, box2))
    union = area(box1) + area(box2) - inter
    return inter / union


def pairwise_iou(boxes1, boxes2):
    """IoU matrix between two box sets.

    Args:
      boxes1: [..., N, 4]
      boxes2: [..., M, 4]

    Returns:
      [..., N, M] IoU with a safe denominator (fully-empty pairs give 0).
    """
    ymin1, xmin1, ymax1, xmax1 = jnp.moveaxis(boxes1[..., :, None, :], -1, 0)
    ymin2, xmin2, ymax2, xmax2 = jnp.moveaxis(boxes2[..., None, :, :], -1, 0)
    ih = jnp.maximum(jnp.minimum(ymax1, ymax2) - jnp.maximum(ymin1, ymin2), 0.0)
    iw = jnp.maximum(jnp.minimum(xmax1, xmax2) - jnp.maximum(xmin1, xmin2), 0.0)
    inter = ih * iw
    a1 = jnp.maximum(ymax1 - ymin1, 0.0) * jnp.maximum(xmax1 - xmin1, 0.0)
    a2 = jnp.maximum(ymax2 - ymin2, 0.0) * jnp.maximum(xmax2 - xmin2, 0.0)
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def scale_to_new_size(box, img_shape, pad_shape):
    """Renormalizes boxes from padded-canvas extent to true image extent.

    Matches the reference post-batch box rescale
    (readers/cap2det_reader.py:174-199): coordinates were normalized w.r.t.
    the unpadded image; after padded batching the canvas is larger, so each
    coordinate is multiplied by img_extent/pad_extent.
    """
    img_h, img_w = img_shape[0], img_shape[1]
    pad_h, pad_w = pad_shape[0], pad_shape[1]
    ymin, xmin, ymax, xmax = jnp.moveaxis(box, -1, 0)
    fy = img_h.astype(jnp.float32) / pad_h
    fx = img_w.astype(jnp.float32) / pad_w
    return jnp.stack([ymin * fy, xmin * fx, ymax * fy, xmax * fx], axis=-1)


def coord_norm_to_abs(box, height, width):
    """Normalized -> absolute pixel coordinates (numpy-friendly)."""
    ymin, xmin, ymax, xmax = [box[..., i] for i in range(4)]
    return np.stack(
        [ymin * height, xmin * width, ymax * height, xmax * width], axis=-1
    )


def evaluate_precision_and_recall(
    num_gt_boxes,
    gt_boxes,
    gt_labels,
    num_dt_boxes,
    dt_boxes,
    dt_labels,
    iou_threshold=0.5,
):
    """Greedy per-image matcher for visualization highlighting.

    Host-side numpy; mirrors core/box_utils.py:152-185.
    """
    recall_mask = np.zeros((len(gt_boxes),), dtype=bool)
    precision_mask = np.zeros((len(dt_boxes),), dtype=bool)
    for i in range(int(num_dt_boxes)):
        for j in range(int(num_gt_boxes)):
            if recall_mask[j] or dt_labels[i] != gt_labels[j]:
                continue
            b1, b2 = np.asarray(dt_boxes[i]), np.asarray(gt_boxes[j])
            ih = max(min(b1[2], b2[2]) - max(b1[0], b2[0]), 0.0)
            iw = max(min(b1[3], b2[3]) - max(b1[1], b2[1]), 0.0)
            inter = ih * iw
            a1 = max(b1[2] - b1[0], 0) * max(b1[3] - b1[1], 0)
            a2 = max(b2[2] - b2[0], 0) * max(b2[3] - b2[1], 0)
            union = a1 + a2 - inter
            if union > 0 and inter / union > iou_threshold:
                recall_mask[j] = True
                precision_mask[i] = True
    return recall_mask, precision_mask
