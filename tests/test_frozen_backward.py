"""Dead-backward elision under the voc07_inc2 full first-stage freeze.

voc07_inc2/voc07_groundtruth freeze the ENTIRE first stage
(reference configs/voc07_inc2.pbtxt:113-116 — no Mixed_4e re-enable,
unlike the coco17 configs). The trainer stop_gradients frozen leaves
inside the loss (train/trainer.py make_train_step); with every
first-stage leaf frozen the feature map carries a symbolic-zero
tangent, so JAX partial evaluation must elide the ROI crop+pool
backward kernel AND the whole first-stage backward cone — the dfeat
the kernel would produce feeds nothing (it is dead compute, ~27 ms of
the 124 ms inc2 step before this was wired into bench.py --shape inc2).

Two invariants pinned here:
  1. structural: the grad jaxpr contains exactly ONE pallas_call (the
     forward) under full freeze, TWO (fwd + bwd) when Mixed_4e trains;
  2. numerical: the trainer's stop-gradient masking produces grads for
     trainable leaves matching (to ULP-level reassociation noise) a
     closure differentiating only the trainable leaves (frozen leaves
     captured as constants), and exact zeros for frozen leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.config import pbtxt, schema
from cap2det_tpu.data import synthetic
from cap2det_tpu.models import registry
from cap2det_tpu.train import optimizers
import cap2det_tpu.models  # noqa: F401

CLASSES = ["person", "dog", "car"]

_MODEL_PBTXT = """
model {
  [Cap2DetModel.ext] {
    midn_loss_weight: 1.0
    oicr_loss_weight: 0.5
    frcnn_options {
      feature_extractor { type: 'faster_rcnn_inception_v2' }
      initial_crop_size: 6
      maxpool_kernel_size: 2
      maxpool_stride: 2
      dropout_keep_prob: 1.0
      dropout_on_feature_map: false
    }
    oicr_iterations: 1
    oicr_iou_threshold: 0.6
    midn_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.4
      max_size_per_class: 4 max_total_size: 8
    }
    oicr_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.3
      max_size_per_class: 4 max_total_size: 8
    }
    label_extractor { groundtruth_extractor { label_file: '%s' } }
  }
}
"""

_FULL_FREEZE = """
train_config {
  max_steps: 10
  learning_rate: 0.01
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 1.0 }
}
"""

_MIXED_4E_UNFROZEN = """
train_config {
  max_steps: 10
  learning_rate: 0.01
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 1.0 }
  gradient_multiplier {
    scope: 'first_stage_feature_extraction/InceptionV2/Mixed_4e'
    multiplier: 1.0
  }
}
"""


def _build(tmp_path, use_pallas):
    label_file = synthetic.write_label_file(
        str(tmp_path / "labels.txt"), CLASSES
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(_MODEL_PBTXT % label_file)["model"]
    )
    return registry.build(
        model_cfg, is_training=True, compute_dtype=jnp.float32,
        use_pallas=use_pallas,
    )


def _batch(batch=1, hw=64, num_proposals=8):
    rng = np.random.RandomState(0)
    y0 = rng.uniform(0, 0.5, (batch, num_proposals))
    x0 = rng.uniform(0, 0.5, (batch, num_proposals))
    proposals = np.stack(
        [y0, x0, y0 + rng.uniform(0.2, 0.5, (batch, num_proposals)),
         x0 + rng.uniform(0.2, 0.5, (batch, num_proposals))], -1
    ).astype(np.float32)
    labels = np.zeros((batch, len(CLASSES)), np.float32)
    labels[:, :2] = 1.0
    return {
        "image": rng.uniform(0, 255, (batch, hw, hw, 3)).astype(np.float32),
        "proposals": proposals,
        "num_proposals": np.full((batch,), num_proposals, np.int32),
        "labels": labels,
    }


def _mask_for(model, train_pbtxt):
    params = model.init_params(jax.random.PRNGKey(0))
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(train_pbtxt)
    ).train_config
    _, mask, _ = optimizers.build_optimizer(
        train_config, params,
        non_trainable_paths=model.non_trainable_paths,
        non_trainable_substrings=model.non_trainable_substrings,
    )
    return params, mask


def _masked_grad_fn(model, mask, batch, rng):
    def loss_fn(p):
        p = jax.tree.map(
            lambda leaf, t: leaf if t else jax.lax.stop_gradient(leaf),
            p, mask,
        )
        return model.loss(p, batch, rng=rng, is_training=True)[0]

    return jax.grad(loss_fn)


@pytest.mark.parametrize(
    "train_pbtxt,expected_pallas_calls",
    [(_FULL_FREEZE, 1), (_MIXED_4E_UNFROZEN, 2)],
    ids=["full_freeze_elides_bwd", "mixed4e_keeps_bwd"],
)
def test_roi_backward_pallas_call_count(tmp_path, train_pbtxt,
                                        expected_pallas_calls):
    # use_pallas=True: tracing the kernel needs no TPU; the jaxpr exposes
    # exactly which pallas_calls survive partial evaluation. Verified to
    # match the compiled-TPU HLO custom-call count (1 vs 2) on hardware.
    model = _build(tmp_path, use_pallas=True)
    params, mask = _mask_for(model, train_pbtxt)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    grad_fn = _masked_grad_fn(model, mask, batch, jax.random.PRNGKey(1))
    jaxpr = jax.make_jaxpr(grad_fn)(params)
    assert str(jaxpr).count("pallas_call") == expected_pallas_calls


def test_masked_grads_match_trainable_only_closure(tmp_path):
    """Trainer-style stop-gradient masking == differentiating only the
    trainable leaves; frozen leaves receive exact-zero grads.

    Both gradients run EAGERLY: under two separate jits, XLA's fusion
    choices diverge between the differently-shaped programs and
    reassociation drifts up to ~1e-3 through the conv backward — eager
    autodiff isolates the masking semantics and is exactly equal.
    """
    model = _build(tmp_path, use_pallas=False)
    params, mask = _mask_for(model, _FULL_FREEZE)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    rng = jax.random.PRNGKey(1)

    grads = _masked_grad_fn(model, mask, batch, rng)(params)

    flat_params, treedef = jax.tree_util.tree_flatten(params)
    flat_mask = jax.tree_util.tree_leaves(mask)
    trainable = [p for p, t in zip(flat_params, flat_mask) if t]

    def loss_trainable(tr):
        it_t = iter(tr)
        merged = [next(it_t) if t else p
                  for p, t in zip(flat_params, flat_mask)]
        p = jax.tree_util.tree_unflatten(treedef, merged)
        return model.loss(p, batch, rng=rng, is_training=True)[0]

    grads_tr = jax.grad(loss_trainable)(trainable)

    flat_grads = jax.tree_util.tree_leaves(grads)
    it = iter(grads_tr)
    for g, t in zip(flat_grads, flat_mask):
        if t:
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(next(it))
            )
        else:
            np.testing.assert_array_equal(np.asarray(g), 0.0)
