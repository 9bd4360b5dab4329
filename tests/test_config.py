"""Config parsing tests: all nine reference pbtxt configs must parse verbatim."""

import glob
import os

import pytest

from cap2det_tpu.config import pbtxt, schema

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*.pbtxt"))


def test_pbtxt_scalars():
    d = pbtxt.parse('a: 1\nb: 2.5\nc: true\nd: "x\\ny"\ne: RELU_6\nf: -3')
    assert d == {"a": 1, "b": 2.5, "c": True, "d": "x\ny", "e": "RELU_6", "f": -3}


def test_pbtxt_repeated_and_nested():
    d = pbtxt.parse(
        """
        m { x: 1 }
        r: 1.2 r: 0.8
        m2: { y: "s" }
        """
    )
    assert d["m"] == {"x": 1}
    assert list(d["r"]) == [1.2, 0.8]
    assert d["m2"] == {"y": "s"}


def test_pbtxt_extension_key():
    d = pbtxt.parse("model { [Cap2DetModel.ext] { oicr_iterations: 3 } }")
    assert d["model"]["Cap2DetModel.ext"]["oicr_iterations"] == 3


def test_pbtxt_string_concat_and_comments():
    d = pbtxt.parse('# comment\ns: "a" "b"  # trailing\n')
    assert d["s"] == "ab"


@pytest.mark.parametrize("path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS])
def test_reference_config_parses(path):
    pipeline = schema.load_pipeline(path)
    assert pipeline.train_reader is not None
    assert pipeline.eval_reader is not None
    assert pipeline.model is not None
    assert pipeline.model.which_oneof() in ("cap2det_model", "text_model")
    assert pipeline.train_config.max_steps > 0


def test_extend_match_config_values():
    p = schema.load_pipeline("/root/reference/configs/coco17_extend_match.pbtxt")
    tr = p.train_reader.cap2det_reader
    assert tr.batch_size == 2
    assert tr.is_training is True
    assert tr.image_resizer.keep_aspect_ratio_resizer.min_dimension == 1000
    assert tr.preprocess_options.random_flip_left_right_prob == 0.5
    assert tr.max_num_proposals == 500
    assert tr.batch_resize_scale_value == [1.2, 0.8, 0.6, 0.4]

    m = p.model.cap2det_model
    assert m.midn_loss_weight == 1.0
    assert m.oicr_loss_weight == 0.5
    assert m.oicr_iterations == 3
    assert m.oicr_iou_threshold == 0.6
    assert m.frcnn_options.feature_extractor.type == "faster_rcnn_inception_v2"
    assert m.frcnn_options.initial_crop_size == 14
    assert m.frcnn_options.dropout_keep_prob == 0.5
    assert m.fc_hyperparams.activation == "RELU_6"
    assert m.fc_hyperparams.regularizer.l2_regularizer.weight == 1e-6
    assert m.fc_hyperparams.initializer.truncated_normal_initializer.stddev == 0.01
    assert m.midn_post_processor.iou_thresh == 0.4
    assert m.oicr_post_processor.iou_thresh == 0.3
    assert m.eval_min_dimension == [1200, 800, 600, 400]
    assert m.label_extractor.which_oneof() == "extend_match_extractor"
    assert m.label_extractor.extend_match_extractor.label_file == (
        "data/coco_label_synonyms.txt"
    )

    tc = p.train_config
    assert tc.max_steps == 500000
    assert tc.learning_rate == 0.01
    assert tc.optimizer.which_oneof() == "adagrad"
    assert tc.learning_rate_decay.decay_steps == 200000
    assert tc.has_field("moving_average_decay") and tc.moving_average_decay == 0.0
    assert [ (g.scope, g.multiplier) for g in tc.gradient_multiplier ] == [
        ("first_stage_feature_extraction", 0.0),
        ("second_stage_feature_extraction", 1.0),
        ("first_stage_feature_extraction/InceptionV2/Mixed_4e", 1.0),
    ]
    assert p.eval_config.steps == 100


def test_text_model_config_values():
    p = schema.load_pipeline("/root/reference/configs/coco17_text.pbtxt")
    tr = p.train_reader.cap2det_reader
    assert tr.decode_image is False
    assert tr.batch_size == 20
    m = p.model.text_model
    assert m.label_extractor.label_file == "data/coco_label.txt"
    assert m.text_classifier.hidden_units == 400
    assert m.text_classifier.dropout_keep_proba == 0.5
    assert m.text_classifier.label_threshold == 0.7


def test_defaults_and_presence():
    p = schema.loads_pipeline(
        """
        train_config { max_steps: 10 }
        """
    )
    tc = p.train_config
    assert tc.save_summary_steps == 2000
    assert tc.keep_checkpoint_max == 5
    assert not tc.has_field("learning_rate_decay")
    assert not tc.has_field("moving_average_decay")
    assert tc.moving_average_decay == 0.999


def test_unknown_field_rejected():
    with pytest.raises(schema.ConfigError):
        schema.loads_pipeline("train_config { bogus_field: 1 }")


OUR_CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.pbtxt")))


@pytest.mark.parametrize(
    "path", OUR_CONFIGS, ids=[os.path.basename(p) for p in OUR_CONFIGS]
)
def test_shipped_config_parses(path):
    pipeline = schema.load_pipeline(path)
    assert pipeline.model.which_oneof() in ("cap2det_model", "text_model")
