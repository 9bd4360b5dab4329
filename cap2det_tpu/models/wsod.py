"""Weakly-supervised detection heads: MIDN and OICR.

MIDN (reference cap2det_model.py:53-109): WSDDN-style two-branch head.
Per proposal p and class c:

  proba_r_given_c = masked-softmax over proposals of W_det features
  class_logits    = sum_p proba_r_given_c * W_cls features
  proposal_scores = sigmoid(class_logits) * proba_r_given_c

OICR (reference models/utils.py:15-105): for refinement k, the previous
iteration's scores seed per-class "most confident" proposals; proposals
with IoU >= threshold against the seed (gated on the image-level label)
become positives, the rest background; targets are row-normalized and
trained with softmax CE against stop-gradient targets, masked-averaged
over real proposals.

The reference unrolls a Python loop over classes (models/utils.py:53-80);
here the target assignment is one batched gather + IoU broadcast over
[batch, P, C] — the shape XLA tiles well on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cap2det_tpu.ops import boxes as box_ops
from cap2det_tpu.ops import losses as loss_ops
from cap2det_tpu.ops import masked


def init_fc(rng, in_dim, out_dim, stddev=0.01):
    """FC params per fc_hyperparams (truncated_normal, zeros bias)."""
    return {
        "weights": jax.random.truncated_normal(
            rng, -2.0, 2.0, (in_dim, out_dim), jnp.float32
        )
        * stddev,
        "biases": jnp.zeros((out_dim,), jnp.float32),
    }


def fc(params, x):
    return x @ params["weights"] + params["biases"]


def midn_head(params, proposal_features, proposal_mask):
    """Multiple-instance detection network.

    Args:
      params: {'proba_r_given_c': fc, 'proba_c_given_r': fc}.
      proposal_features: [B, P, D].
      proposal_mask: [B, P] float (1 = real proposal).

    Returns:
      class_logits: [B, C].
      proposal_scores: [B, P, C].
      proba_r_given_c: [B, P, C].
    """
    mask = proposal_mask[..., None]
    logits_r_given_c = fc(params["proba_r_given_c"], proposal_features)
    logits_c_given_r = fc(params["proba_c_given_r"], proposal_features)

    proba_r_given_c = masked.masked_softmax(
        mask * logits_r_given_c, mask, axis=1
    )
    proba_r_given_c = mask * proba_r_given_c

    class_logits = masked.masked_sum(
        logits_c_given_r * proba_r_given_c, mask, axis=1, keepdims=False
    )  # [B, C]
    proposal_scores = jax.nn.sigmoid(class_logits)[:, None, :] * proba_r_given_c
    return class_logits, proposal_scores, proba_r_given_c


def oicr_target_assignment(labels, proposals, scores_prev, proposal_mask,
                           iou_threshold):
    """Pseudo-label distribution for one OICR refinement.

    Args:
      labels: [B, C] image-level multi-hot.
      proposals: [B, P, 4].
      scores_prev: [B, P, 1+C] previous-iteration scores (col 0 = bkg).
      proposal_mask: [B, P] float.

    Returns:
      [B, P, 1+C] row-normalized target distribution.
    """
    # Per-class most confident proposal (masked argmax over P).
    seed_idx = masked.masked_argmax(
        scores_prev[:, :, 1:], proposal_mask[..., None], axis=1
    )  # [B, C]
    seed_boxes = jnp.take_along_axis(
        proposals[:, :, None, :],
        seed_idx[:, None, :, None].astype(jnp.int32),
        axis=1,
    )[:, 0]  # [B, C, 4]

    iou = box_ops.pairwise_iou(proposals, seed_boxes)  # [B, P, C]
    target = (iou >= iou_threshold).astype(jnp.float32)
    target = target * (labels[:, None, :] > 0)

    bkg = (jnp.sum(target, axis=-1, keepdims=True) <= 0).astype(jnp.float32)
    proposal_labels = jnp.concatenate([bkg, target], axis=-1)
    return proposal_labels / jnp.sum(proposal_labels, axis=-1, keepdims=True)


def oicr_loss(labels, proposals, scores_prev, scores_next, proposal_mask,
              iou_threshold=0.5):
    """One refinement's softmax CE against stop-gradient targets
    (reference calc_oicr_loss, models/utils.py:15-105)."""
    targets = oicr_target_assignment(
        labels, proposals, jax.lax.stop_gradient(scores_prev), proposal_mask,
        iou_threshold,
    )
    ce = loss_ops.softmax_cross_entropy(
        jax.lax.stop_gradient(targets), scores_next
    )  # [B, P]
    return jnp.mean(masked.masked_avg(ce, proposal_mask, axis=1))
