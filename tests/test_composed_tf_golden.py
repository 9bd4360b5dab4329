"""Composed image -> detections golden vs a single TF2 twin.

The per-unit TF goldens (first/second stage in test_backbone_tf_parity,
crop_and_resize in test_roi_nms, NMS in test_roi_nms) verify each stage
in isolation; a sign/coordinate slip BETWEEN tested units would pass all
of them. This test chains the SAME TF twins into one composed forward —
preprocess -> first stage -> tf.image.crop_and_resize -> max-pool ->
second stage -> spatial mean -> MIDN + OICR FC heads -> per-iteration
class-wise NMS — on one fixed image + proposals, over the repo's
multi-scale eval recipe (mean of per-scale proposal scores,
reference cap2det_model.py:218-272), and asserts the repo's f32 eval
path (MultiScalePredictor: jitted scores + postprocess) matches at
every OICR iteration's detections.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cap2det_tpu.config import pbtxt, schema
from cap2det_tpu.data import pipeline as pipeline_lib
from cap2det_tpu.data import synthetic
from cap2det_tpu.eval import evaluator as evaluator_lib
from cap2det_tpu.fields import DetectionFields
from cap2det_tpu.models import registry
import cap2det_tpu.models  # noqa: F401

from tests import test_backbone_tf_parity as twin

tf = pytest.importorskip("tensorflow")

CLASSES = ["person", "dog", "car"]
OICR_ITERS = 2
CROP = 6
MAX_PER_CLASS = 4
MAX_TOTAL = 8
SCORE_THRESH = 1e-5
MIDN_IOU, OICR_IOU = 0.4, 0.3

_MODEL_PBTXT = """
model {
  [Cap2DetModel.ext] {
    midn_loss_weight: 1.0
    oicr_loss_weight: 0.5
    frcnn_options {
      feature_extractor { type: 'faster_rcnn_inception_v2' }
      initial_crop_size: %d
      maxpool_kernel_size: 2
      maxpool_stride: 2
      dropout_keep_prob: 1.0
      dropout_on_feature_map: false
    }
    oicr_iterations: %d
    oicr_iou_threshold: 0.6
    eval_min_dimension: 64
    eval_min_dimension: 96
    midn_post_processor {
      score_thresh: %r iou_thresh: %r
      max_size_per_class: %d max_total_size: %d
    }
    oicr_post_processor {
      score_thresh: %r iou_thresh: %r
      max_size_per_class: %d max_total_size: %d
    }
    label_extractor { groundtruth_extractor { label_file: '%%s' } }
  }
}
""" % (CROP, OICR_ITERS, SCORE_THRESH, MIDN_IOU, MAX_PER_CLASS, MAX_TOTAL,
       SCORE_THRESH, OICR_IOU, MAX_PER_CLASS, MAX_TOTAL)

_READER_PBTXT = """
cap2det_reader {
  input_pattern: "unused"
  is_training: false
  batch_size: 1
  image_resizer { keep_aspect_ratio_resizer { min_dimension: 64 } }
  max_num_proposals: 12
}
"""


def _nms_iter(boxes, scores, iou_thresh):
    """TF twin of ops/nms.build_post_processor semantics: per-class
    greedy NMS (score floor, per-class cap), classes 1-based, merged and
    re-capped by score."""
    picked = []
    num_classes = scores.shape[-1]
    for c in range(num_classes):
        sel = tf.image.non_max_suppression(
            tf.constant(boxes), tf.constant(scores[:, c]),
            MAX_PER_CLASS, iou_threshold=iou_thresh,
            score_threshold=SCORE_THRESH,
        ).numpy()
        for i in sel:
            picked.append((float(scores[i, c]), boxes[i], c + 1))
    picked.sort(key=lambda t: -t[0])
    picked = picked[:MAX_TOTAL]
    n = len(picked)
    out_boxes = np.zeros((MAX_TOTAL, 4), np.float32)
    out_scores = np.zeros((MAX_TOTAL,), np.float32)
    out_classes = np.zeros((MAX_TOTAL,), np.float32)
    for i, (s, b, c) in enumerate(picked):
        out_boxes[i] = b
        out_scores[i] = s
        out_classes[i] = c
    return n, out_boxes, out_scores, out_classes


@pytest.mark.slow
def test_composed_image_to_detections_matches_tf(tmp_path):
    label_file = synthetic.write_label_file(
        str(tmp_path / "labels.txt"), CLASSES
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(_MODEL_PBTXT % label_file)["model"]
    )
    model = registry.build(
        model_cfg, is_training=False, compute_dtype=jnp.float32
    )
    reader_cfg = schema.Reader.from_dict(
        pbtxt.parse(_READER_PBTXT)
    ).cap2det_reader

    params = model.init_params(jax.random.PRNGKey(7))
    # Non-trivial BN stats in both stages so placement bugs can't hide.
    rng = np.random.default_rng(11)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    twin._randomize_bn(params, rng)

    # One fixed image + proposals.
    image = rng.uniform(0, 255, (80, 112, 3)).astype(np.float32)
    image = np.round(image).astype(np.uint8)
    num_props = 12
    y0 = rng.uniform(0, 0.6, num_props)
    x0 = rng.uniform(0, 0.6, num_props)
    props = np.stack(
        [y0, x0, y0 + rng.uniform(0.15, 0.4, num_props),
         x0 + rng.uniform(0.15, 0.4, num_props)], -1
    ).astype(np.float32)
    props = np.clip(props, 0.0, 1.0)

    example = {
        "image_id": "composed_golden",
        "image_encoded": synthetic.encode_jpeg(image),
        "proposals": props,
    }

    # ---- repo side: the production eval path -----------------------------
    predictor = evaluator_lib.MultiScalePredictor(
        model, params, reader_cfg
    )
    got = predictor.predict(example)

    # ---- TF twin ---------------------------------------------------------
    decoded = pipeline_lib.decode_jpeg(example["image_encoded"])
    h, w = decoded.shape[:2]
    landscape = w >= h
    frcnn_tree = {
        "first": params["first_stage_feature_extraction"],
        "second": params["second_stage_feature_extraction"],
    }

    score_sum = {}
    for min_dim in model.options.eval_min_dimension:
        short, long_ = pipeline_lib.compute_canvas(min_dim, 1.0, 1.5, 32)
        ch, cw = (short, long_) if landscape else (long_, short)
        canvas, (new_h, new_w) = pipeline_lib.fit_image_to_canvas(
            decoded, (ch, cw)
        )
        fy, fx = new_h / ch, new_w / cw
        scaled_props = props * np.array([fy, fx, fy, fx], np.float32)

        # f16 pixel quantization as shipped by MultiScalePredictor.
        pixels = tf.constant(
            canvas.astype(np.float16).astype(np.float32)[None]
        )
        pre = (2.0 / 255.0) * pixels - 1.0
        feat = twin.tf_first_stage(frcnn_tree["first"], pre)
        crops = tf.image.crop_and_resize(
            feat, tf.constant(scaled_props),
            tf.zeros((num_props,), tf.int32), [CROP, CROP],
        )
        pooled = tf.nn.max_pool2d(crops, 2, 2, "VALID")
        box_feat = twin.tf_second_stage(frcnn_tree["second"], pooled)
        pfeat = tf.reduce_mean(box_feat, axis=[1, 2])  # [P, 1024]

        def fc(p, x):
            return tf.matmul(x, p["weights"]) + p["biases"]

        logits_r = fc(params["midn"]["proba_r_given_c"], pfeat)  # [P, C]
        logits_c = fc(params["midn"]["proba_c_given_r"], pfeat)
        proba_r_given_c = tf.nn.softmax(logits_r, axis=0)
        class_logits = tf.reduce_sum(logits_c * proba_r_given_c, axis=0)
        proposal_scores = (
            tf.nn.sigmoid(class_logits)[None, :] * proba_r_given_c
        )

        scores = {"oicr_proposal_scores_at_0": proposal_scores.numpy()}
        for k in range(1, OICR_ITERS + 1):
            scores["oicr_proposal_scores_at_%d" % k] = fc(
                params["oicr"]["iter%d" % k], pfeat
            ).numpy()
        for key, v in scores.items():
            score_sum[key] = score_sum.get(key, 0.0) + v

    n_scales = len(model.options.eval_min_dimension)
    score_mean = {k: v / n_scales for k, v in score_sum.items()}

    # The repo postprocess pads proposals to max_num_proposals; the twin
    # works on the true 12 (the repo masks padded slots out of NMS).
    for k in range(OICR_ITERS + 1):
        key = "oicr_proposal_scores_at_%d" % k
        repo_scores = got["proposal_scores"][key][0][:num_props]
        np.testing.assert_allclose(
            repo_scores, score_mean[key], rtol=2e-3, atol=2e-4,
            err_msg="per-scale-mean scores diverge at iteration %d" % k,
        )
        if k == 0:
            cls_scores = score_mean[key]
        else:
            e = np.exp(
                score_mean[key] - score_mean[key].max(-1, keepdims=True)
            )
            cls_scores = (e / e.sum(-1, keepdims=True))[:, 1:]
        n, boxes, det_scores, det_classes = _nms_iter(
            props, cls_scores.astype(np.float32),
            MIDN_IOU if k == 0 else OICR_IOU,
        )
        suffix = "_at_%d" % k
        assert int(got[DetectionFields.num_detections + suffix]) == n, (
            "detection count mismatch at iteration %d" % k
        )

        # Near-tie scores may order differently between the two
        # implementations (sub-2e-3 numeric drift through the composed
        # stack); compare as canonically-sorted detection SETS.
        def canon(boxes_, scores_, classes_):
            rows = [
                (float(classes_[i]), *[float(v) for v in boxes_[i]],
                 float(scores_[i]))
                for i in range(n)
            ]
            return sorted(rows)

        got_rows = canon(
            got[DetectionFields.detection_boxes + suffix],
            got[DetectionFields.detection_scores + suffix],
            got[DetectionFields.detection_classes + suffix],
        )
        want_rows = canon(boxes, det_scores, det_classes)
        for gr, wr in zip(got_rows, want_rows):
            assert gr[0] == wr[0], (k, gr, wr)  # class
            np.testing.assert_allclose(gr[1:5], wr[1:5], rtol=1e-5,
                                       atol=1e-6)  # box
            np.testing.assert_allclose(gr[5], wr[5], rtol=2e-3,
                                       atol=2e-4)  # score
