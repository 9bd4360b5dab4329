"""Batched class-wise non-max suppression, XLA/TPU-friendly.

Replaces the object_detection ``batch_multiclass_non_max_suppression``
wrapper (reference core/builder.py:15-67): class-agnostic proposal boxes
scored per class, greedy per-class suppression, per-class cap, global
top-``max_total_size`` merge, and the reference's 1-based returned class
ids (core/builder.py:65).

Everything is fixed-shape: the greedy suppression runs as one
``lax.fori_loop`` over the (static) proposal count with all classes (and
batch) processed in parallel per iteration; selection masks replace
dynamic-length filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cap2det_tpu.ops import boxes as box_ops


def _per_image_nms(boxes, scores, iou_thresh, score_thresh, max_per_class):
    """Greedy NMS for one image.

    Args:
      boxes: [P, 4] class-agnostic boxes.
      scores: [P, C] per-class scores.

    Returns:
      selected: [P, C] bool mask of surviving (box, class) pairs.
    """
    num_p, num_c = scores.shape
    iou = box_ops.pairwise_iou(boxes, boxes)  # [P, P]

    # Descending stable order per class: [C, P] of box indices.
    order = jnp.argsort(-scores.T, axis=-1, stable=True)
    valid0 = (scores.T > score_thresh)  # [C, P]
    rank = jnp.argsort(order, axis=-1, stable=True)  # rank of each box per class

    def body(i, keep):
        cur = order[:, i]  # [C] current box index per class
        cur_alive = jnp.take_along_axis(keep, cur[:, None], axis=1)[:, 0]
        cur_valid = jnp.take_along_axis(valid0, cur[:, None], axis=1)[:, 0]
        active = cur_alive & cur_valid  # [C]
        overlap = iou[cur] > iou_thresh  # [C, P]
        # Suppress boxes strictly after `cur` in this class's order.
        later = rank > i
        suppress = active[:, None] & overlap & later
        return keep & ~suppress

    keep = jax.lax.fori_loop(
        0, num_p, body, jnp.ones((num_c, num_p), dtype=bool)
    )
    keep = keep & valid0

    # Per-class cap: keep only the first `max_per_class` survivors in
    # score order.
    keep_sorted = jnp.take_along_axis(keep, order, axis=1)
    rank_within = jnp.cumsum(keep_sorted.astype(jnp.int32), axis=1)
    keep_sorted = keep_sorted & (rank_within <= max_per_class)
    # `rank` (above) IS the inverse permutation of `order`.
    keep = jnp.take_along_axis(keep_sorted, rank, axis=1)
    return keep.T  # [P, C]


def batch_multiclass_nms(
    boxes,
    scores,
    score_thresh=1e-6,
    iou_thresh=0.5,
    max_size_per_class=100,
    max_total_size=300,
):
    """Batched class-wise NMS.

    Args:
      boxes: [B, P, 4] normalized class-agnostic boxes.
      scores: [B, P, C] per-class scores (no background column).

    Returns:
      num_detections: [B] int32.
      detection_boxes: [B, max_total_size, 4].
      detection_scores: [B, max_total_size].
      detection_classes: [B, max_total_size] float, **1-based** class ids.
    """
    num_b, num_p, num_c = scores.shape
    selected = jax.vmap(
        lambda b, s: _per_image_nms(
            b, s, iou_thresh, score_thresh, max_size_per_class
        )
    )(boxes, scores)  # [B, P, C]

    flat_scores = jnp.where(selected, scores, -jnp.inf).reshape(num_b, -1)
    k = min(max_total_size, num_p * num_c)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)  # [B, k]

    box_idx = top_idx // num_c
    class_idx = top_idx % num_c
    det_boxes = jnp.take_along_axis(
        boxes, box_idx[..., None], axis=1
    )  # [B, k, 4]
    valid = jnp.isfinite(top_scores)
    det_scores = jnp.where(valid, top_scores, 0.0)
    det_classes = jnp.where(valid, class_idx.astype(jnp.float32) + 1.0, 0.0)
    det_boxes = jnp.where(valid[..., None], det_boxes, 0.0)
    num_detections = valid.sum(axis=-1).astype(jnp.int32)

    if k < max_total_size:
        pad = max_total_size - k
        det_boxes = jnp.pad(det_boxes, ((0, 0), (0, pad), (0, 0)))
        det_scores = jnp.pad(det_scores, ((0, 0), (0, pad)))
        det_classes = jnp.pad(det_classes, ((0, 0), (0, pad)))
    return num_detections, det_boxes, det_scores, det_classes


def build_post_processor(options):
    """Factory from a PostProcess config (reference core/builder.py:15-67).

    Returns fn(boxes [B,P,4], scores [B,P,C]) -> (num_detections, boxes,
    scores, classes_1based).
    """

    def post_process(boxes, scores):
        return batch_multiclass_nms(
            boxes,
            scores,
            score_thresh=options.score_thresh,
            iou_thresh=options.iou_thresh,
            max_size_per_class=options.max_size_per_class,
            max_total_size=options.max_total_size,
        )

    return post_process
