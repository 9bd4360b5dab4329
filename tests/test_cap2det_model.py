"""End-to-end Cap2Det model tests on tiny shapes (the reference left this
untested — models/cap2det_model_test.py is an empty stub)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap2det_tpu.config import pbtxt, schema
from cap2det_tpu.data import synthetic
from cap2det_tpu.fields import DetectionFields
from cap2det_tpu.models import registry
import cap2det_tpu.models  # noqa: F401  (registers models)

CLASSES = ["person", "dog", "car"]


def _model_cfg(label_file, oicr_iterations=2):
    text = """
    [Cap2DetModel.ext] {
      midn_loss_weight: 1.0
      oicr_loss_weight: 0.5
      frcnn_options {
        feature_extractor { type: 'faster_rcnn_inception_v2' }
        initial_crop_size: 6
        maxpool_kernel_size: 2
        maxpool_stride: 2
        dropout_keep_prob: 0.5
        dropout_on_feature_map: false
      }
      fc_hyperparams {
        op: FC
        regularizer { l2_regularizer { weight: 0.000001 } }
        initializer { truncated_normal_initializer { stddev: 0.01 } }
      }
      oicr_iterations: %d
      oicr_iou_threshold: 0.6
      midn_post_processor {
        score_thresh: 0.00001 iou_thresh: 0.4
        max_size_per_class: 10 max_total_size: 20
      }
      oicr_post_processor {
        score_thresh: 0.00001 iou_thresh: 0.3
        max_size_per_class: 10 max_total_size: 20
      }
      label_extractor { groundtruth_extractor { label_file: '%s' } }
    }
    """ % (oicr_iterations, label_file)
    return schema.Model.from_dict(pbtxt.parse("model { %s }" % text)["model"])


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cap2det")
    label_file = synthetic.write_label_file(str(d / "labels.txt"), CLASSES)
    cfg = _model_cfg(label_file)
    model = registry.build(cfg, is_training=True, compute_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _tiny_batch(num_proposals=8, batch=2, hw=64):
    rng = np.random.RandomState(0)
    y0 = rng.uniform(0, 0.5, (batch, num_proposals))
    x0 = rng.uniform(0, 0.5, (batch, num_proposals))
    proposals = np.stack(
        [y0, x0, y0 + rng.uniform(0.2, 0.5, (batch, num_proposals)),
         x0 + rng.uniform(0.2, 0.5, (batch, num_proposals))], -1
    ).astype(np.float32)
    return {
        "image": rng.uniform(0, 255, (batch, hw, hw, 3)).astype(np.float32),
        "proposals": proposals,
        "num_proposals": np.array([num_proposals, num_proposals - 2], np.int32),
        "labels": np.array([[1, 0, 1], [0, 1, 0]], np.float32),
    }


def test_loss_and_gradients(tiny_model):
    model, params = tiny_model
    batch = _tiny_batch()

    @jax.jit
    def loss_fn(p, batch, rng):
        return model.loss(p, batch, rng=rng, is_training=True)

    (total, loss_dict), grads = jax.value_and_grad(
        lambda p: loss_fn(p, batch, jax.random.PRNGKey(1)), has_aux=True
    )(params)

    assert np.isfinite(float(total))
    assert "midn_cross_entropy_loss" in loss_dict
    assert "oicr_cross_entropy_loss_at_1" in loss_dict
    assert "oicr_cross_entropy_loss_at_2" in loss_dict
    assert "regularization_loss" in loss_dict

    # Gradients reach the MIDN head, OICR heads, and both backbone stages.
    def gnorm(tree):
        return float(
            sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(tree))
        )

    assert gnorm(grads["midn"]) > 0
    assert gnorm(grads["oicr"]) > 0
    assert gnorm(grads["second_stage_feature_extraction"]) > 0
    assert gnorm(grads["first_stage_feature_extraction"]) > 0


def test_predictions_and_postprocess(tiny_model):
    model, params = tiny_model
    batch = _tiny_batch()
    preds = jax.jit(
        lambda p, b: model.predictions(p, b, is_training=False)
    )(params, batch)

    scores0 = np.asarray(preds["oicr_proposal_scores_at_0"])
    assert scores0.shape == (2, 8, 3)
    assert np.asarray(preds["oicr_proposal_scores_at_1"]).shape == (2, 8, 4)

    results = model.postprocess(
        {k: preds[k] for k in model.score_keys()}, batch["proposals"]
    )
    for i in range(3):
        n = np.asarray(results[DetectionFields.num_detections + "_at_%d" % i])
        assert n.shape == (2,)
        b = np.asarray(results[DetectionFields.detection_boxes + "_at_%d" % i])
        assert b.shape == (2, 20, 4)
        c = np.asarray(results[DetectionFields.detection_classes + "_at_%d" % i])
        assert c.max() <= 3.0  # 1-based class ids


def test_masked_proposals_do_not_affect_loss(tiny_model):
    """Scores in padded proposal slots must not change the loss."""
    model, params = tiny_model
    batch = _tiny_batch()
    total1, _ = model.loss(params, batch, is_training=False)

    batch2 = dict(batch)
    # Perturb padded proposal boxes of image 1 (slots 6,7 are padding).
    p2 = batch["proposals"].copy()
    p2[1, 6:] = np.array([0.1, 0.1, 0.9, 0.9], np.float32)
    batch2["proposals"] = p2
    total2, _ = model.loss(params, batch2, is_training=False)
    # MIDN masks padded features; OICR masked-avg ignores them. The only
    # leak is the feature extractor crop (features of padded boxes flow
    # through batch stats nowhere), so losses must match.
    np.testing.assert_allclose(float(total1), float(total2), rtol=1e-4)
