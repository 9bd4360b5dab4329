"""VOC evaluator unit tests + Cap2Det eval-path integration test."""

import json

import numpy as np
import pytest

from cap2det_tpu.eval import voc_eval


CATS = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


def test_perfect_detection_ap1():
    ev = voc_eval.PascalDetectionEvaluator(CATS)
    gt = np.array([[0, 0, 1, 1], [2, 2, 3, 3]], np.float32)
    ev.add_single_ground_truth_image_info(
        "img0", {"groundtruth_boxes": gt, "groundtruth_classes": [1, 2]}
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": gt,
            "detection_scores": [0.9, 0.8],
            "detection_classes": [1, 2],
        },
    )
    res = ev.evaluate()
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)
    assert res["PascalBoxes_PerformanceByCategory/AP@0.5IOU/a"] == pytest.approx(1.0)
    assert res["PascalBoxes_Precision/meanCorLoc@0.5IOU"] == pytest.approx(1.0)


def test_fp_before_tp_ap():
    """One FP ranked above one TP: AP = 0.5 (precision 1/2 at recall 1)."""
    ev = voc_eval.PascalDetectionEvaluator([{"id": 1, "name": "a"}])
    ev.add_single_ground_truth_image_info(
        "img0",
        {"groundtruth_boxes": [[0, 0, 1, 1]], "groundtruth_classes": [1]},
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": [[5, 5, 6, 6], [0, 0, 1, 1]],
            "detection_scores": [0.9, 0.8],
            "detection_classes": [1, 1],
        },
    )
    res = ev.evaluate()
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)
    # CorLoc: top detection missed -> 0.
    assert res["PascalBoxes_Precision/meanCorLoc@0.5IOU"] == pytest.approx(0.0)


def test_duplicate_detections_are_fp():
    ev = voc_eval.PascalDetectionEvaluator([{"id": 1, "name": "a"}])
    ev.add_single_ground_truth_image_info(
        "img0",
        {"groundtruth_boxes": [[0, 0, 1, 1]], "groundtruth_classes": [1]},
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": [[0, 0, 1, 1], [0, 0, 1.01, 1.01]],
            "detection_scores": [0.9, 0.8],
            "detection_classes": [1, 1],
        },
    )
    res = ev.evaluate()
    # TP then duplicate-FP: precision stays 1.0 up to recall 1.0 -> AP 1.0.
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)


def test_difficult_gt_ignored():
    ev = voc_eval.PascalDetectionEvaluator([{"id": 1, "name": "a"}])
    ev.add_single_ground_truth_image_info(
        "img0",
        {
            "groundtruth_boxes": [[0, 0, 1, 1], [2, 2, 3, 3]],
            "groundtruth_classes": [1, 1],
            "groundtruth_difficult": [False, True],
        },
    )
    ev.add_single_detected_image_info(
        "img0",
        {
            "detection_boxes": [[0, 0, 1, 1], [2, 2, 3, 3]],
            "detection_scores": [0.9, 0.8],
            "detection_classes": [1, 1],
        },
    )
    res = ev.evaluate()
    # Difficult GT: its detection is neither TP nor FP; one easy GT matched.
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)


def test_average_precision_computation():
    precision = np.array([1.0, 0.5, 2 / 3])
    recall = np.array([0.5, 0.5, 1.0])
    ap = voc_eval.compute_average_precision(precision, recall)
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * 2 / 3)


def test_coco_to_voc_remap():
    boxes = np.array([[0, 0, 1, 1], [1, 1, 2, 2], [2, 2, 3, 3]])
    scores = np.array([0.9, 0.8, 0.7])
    classes = np.array([5, 99, 1])  # 5 -> aeroplane(1), 99 dropped, 1 -> person(15)
    b, s, c = voc_eval.convert_coco_result_to_voc(boxes, scores, classes)
    assert len(b) == 2
    np.testing.assert_array_equal(c, [1, 15])


@pytest.mark.slow
def test_cap2det_eval_path(tmp_path):
    """Full eval path on a tiny model + synthetic records."""
    import jax.numpy as jnp
    import jax

    from cap2det_tpu.config import schema, pbtxt
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.eval import evaluator as evaluator_lib
    from cap2det_tpu.eval import export as export_lib
    from cap2det_tpu.eval.html_report import HTMLReport
    from cap2det_tpu.models import registry
    import cap2det_tpu.models  # noqa: F401

    classes = ["person", "dog", "car"]
    record = str(tmp_path / "eval.record")
    synthetic.write_synthetic_dataset(
        record, num_examples=4, seed=5, classes=classes,
        image_hw=(96, 128), num_proposals=12,
    )
    label_file = synthetic.write_label_file(str(tmp_path / "labels.txt"), classes)

    cfg = schema.loads_pipeline(
        """
        eval_reader {
          cap2det_reader {
            input_pattern: "%(record)s"
            is_training: false
            batch_size: 1
            image_resizer { keep_aspect_ratio_resizer { min_dimension: 64 } }
            max_num_proposals: 12
          }
        }
        model {
          [Cap2DetModel.ext] {
            frcnn_options {
              feature_extractor { type: 'faster_rcnn_inception_v2' }
              initial_crop_size: 6
              maxpool_kernel_size: 2
              maxpool_stride: 2
              dropout_keep_prob: 1.0
              dropout_on_feature_map: false
            }
            fc_hyperparams {
              initializer { truncated_normal_initializer { stddev: 0.01 } }
            }
            oicr_iterations: 1
            midn_post_processor {
              score_thresh: 0.00001 iou_thresh: 0.4
              max_size_per_class: 5 max_total_size: 10
            }
            oicr_post_processor {
              score_thresh: 0.00001 iou_thresh: 0.3
              max_size_per_class: 5 max_total_size: 10
            }
            eval_min_dimension: 64
            eval_min_dimension: 96
            label_extractor {
              groundtruth_extractor { label_file: '%(label_file)s' }
            }
          }
        }
        train_config { max_steps: 1 learning_rate: 0.01 optimizer { sgd {} } }
        eval_config { steps: 4 }
        """
        % {"record": record, "label_file": label_file}
    )

    model = registry.build(cfg.model, is_training=False, compute_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    report = HTMLReport(classes, max_examples=4)
    metrics, map_per_iter = evaluator_lib.run_evaluation(
        cfg, params, model=model,
        visualize_fn=lambda ex, res: report.add_example(ex, res, 1),
    )
    assert len(map_per_iter) == 2  # midn + 1 oicr iteration
    assert metrics["num_examples"] == 4
    assert all(0.0 <= m <= 1.0 or np.isnan(m) for m in map_per_iter)

    html_path = str(tmp_path / "report.html")
    report.write(html_path)
    assert "data:image/jpeg;base64" in open(html_path).read()

    json_path = str(tmp_path / "results.json")
    results = export_lib.export_results(cfg, params, json_path, model=model)
    assert len(results) == 4
    loaded = json.load(open(json_path))
    first = next(iter(loaded.values()))
    assert set(first) == {
        "detection_boxes", "detection_scores", "detection_classes",
    }


def test_text_model_eval_dispatch(tmp_path):
    """run_evaluation dispatches to the text-metrics path for TextModel."""
    import jax
    import numpy as np

    from cap2det_tpu.config import schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.eval import evaluator as evaluator_lib
    from cap2det_tpu.models import registry
    import cap2det_tpu.models  # noqa: F401

    classes = ["person", "dog"]
    record = str(tmp_path / "t.record")
    synthetic.write_synthetic_dataset(
        record, num_examples=6, seed=1, classes=classes, with_image=False
    )
    label_file = synthetic.write_label_file(str(tmp_path / "l.txt"), classes)
    vocab_file = str(tmp_path / "v.txt")
    open(vocab_file, "w").write("\n".join(classes + ["a", "the"]))
    emb_file = str(tmp_path / "e.npy")
    np.save(emb_file, np.random.RandomState(0).randn(4, 8).astype(np.float32))

    cfg = schema.loads_pipeline(
        """
        eval_reader {
          cap2det_reader {
            decode_image: false input_pattern: "%s" is_training: false
            batch_size: 1
          }
        }
        model {
          [TextModel.ext] {
            label_extractor { label_file: '%s' }
            text_classifier {
              label_file: '%s'
              open_vocabulary_file: '%s'
              open_vocabulary_word_embedding_file: '%s'
              hidden_units: 8
            }
          }
        }
        train_config { max_steps: 1 learning_rate: 0.1 optimizer { sgd {} } }
        eval_config { steps: 6 }
        """
        % (record, label_file, label_file, vocab_file, emb_file)
    )
    model = registry.build(cfg.model, is_training=False)
    params = model.init_params(jax.random.PRNGKey(0))
    metrics, promote = evaluator_lib.run_evaluation(cfg, params, model=model)
    assert "metrics/recall_at_0.5" in metrics
    assert metrics["num_examples"] == 6
    assert len(promote) == 1
