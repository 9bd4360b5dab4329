"""End-to-end detection quality: overfit a synthetic set, assert mAP.

Exercises the ENTIRE reference call stack 3.1 + 3.2 (SURVEY.md):
pretrained-backbone overlay -> input pipeline -> jitted train loop ->
orbax checkpoint -> continuous_evaluation polling -> multi-scale
prediction (two eval_min_dimensions) -> per-iteration NMS -> VOC-protocol
mAP -> best-checkpoint promotion. Fails if any coordinate / flip / NMS /
eval convention silently breaks (VERDICT r1 item 2).

Why a constructed backbone: with a *random* deep backbone every ROI's
receptive field covers the whole (small) test canvas, so image-level
labels give no localization pressure and WSOD is degenerate. The
"pass-through" backbone (center-tap delta kernels, neutral BN) makes
features spatially local color summaries — the minimal property
selective-search WSOD needs — while still running every real conv /
crop / pool op in the model.
"""

import numpy as np
import pytest

import jax

from cap2det_tpu.config import schema
from cap2det_tpu.data import synthetic, tfrecord
from cap2det_tpu.eval import evaluator as evaluator_lib
from cap2det_tpu.models import frcnn, registry
from cap2det_tpu.train import checkpoint as ckpt_lib
from cap2det_tpu.train import trainer as trainer_lib
import cap2det_tpu.models  # noqa: F401

CLASSES = ["redthing", "greenthing"]

PIPELINE = """
train_reader {
  cap2det_reader {
    input_pattern: "%(record)s"
    is_training: true
    shuffle_buffer_size: 16
    batch_size: 8
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 96 } }
    preprocess_options { random_flip_left_right_prob: 0.5 }
    max_num_proposals: 8
    batch_resize_scale_value: 1.0
  }
}
eval_reader {
  cap2det_reader {
    input_pattern: "%(record)s"
    is_training: false
    batch_size: 1
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 96 } }
    max_num_proposals: 8
  }
}
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
    fc_hyperparams {
      regularizer { l2_regularizer { weight: 0.000001 } }
      initializer { truncated_normal_initializer { stddev: 0.01 } }
    }
    oicr_iterations: 1
    oicr_iou_threshold: 0.6
    midn_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.4
      max_size_per_class: 5 max_total_size: 10
    }
    oicr_post_processor {
      score_thresh: 0.00001 iou_thresh: 0.3
      max_size_per_class: 5 max_total_size: 10
    }
    eval_min_dimension: 96
    eval_min_dimension: 128
    label_extractor { groundtruth_extractor { label_file: '%(label_file)s' } }
  }
}
train_config {
  max_steps: 300
  learning_rate: 0.05
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 0.0 }
  save_checkpoints_steps: 300
  keep_checkpoint_max: 2
  log_step_count_steps: 100
}
eval_config { steps: 16 }
"""


from cap2det_tpu.utils.passthrough_init import make_passthrough  # noqa: E402


@pytest.mark.slow
def test_overfit_synthetic_detection_map(tmp_path):
    record = str(tmp_path / "train.record")
    rng = np.random.default_rng(11)
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(16):
            w.write(synthetic.make_localizable_example(
                rng, "loc-%05d" % i, CLASSES,
                image_hw=(128, 160), num_distractors=7,
            ))
    label_file = synthetic.write_label_file(
        str(tmp_path / "labels.txt"), CLASSES
    )
    cfg = schema.loads_pipeline(
        PIPELINE % {"record": record, "label_file": label_file}
    )

    # Synthesize the warm-start checkpoint in the converter's layout and
    # load it through the real pretrained_checkpoint path.
    model = registry.build(cfg.model, is_training=True)
    params0 = model.init_params(jax.random.PRNGKey(0))
    iv2 = {}
    iv2.update(make_passthrough(params0[frcnn.FIRST_SCOPE]["InceptionV2"]))
    iv2.update(make_passthrough(params0[frcnn.SECOND_SCOPE]["InceptionV2"]))
    pre_path = str(tmp_path / "passthrough_ckpt")
    ckpt_lib.save_params(pre_path, {"InceptionV2": iv2})

    losses = []
    trainer_lib.train(
        cfg,
        model_dir=str(tmp_path / "model"),
        use_mesh=False,
        pretrained_checkpoint=pre_path,
        hooks=[lambda s, st, logs: losses.append(
            float(logs["loss/total_loss"])
        )],
    )
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])

    best = evaluator_lib.continuous_evaluation(
        cfg,
        model_dir=str(tmp_path / "model"),
        max_eval_examples=16,
        max_idle_polls=0,
    )
    assert best is not None
    step, final_map = best
    assert step == 300
    # Overfit train-set mAP@0.5 through the full multi-scale eval loop.
    assert final_map >= 0.5, final_map

    # Best-checkpoint promotion wrote its bookkeeping.
    import os

    saved = os.path.join(str(tmp_path / "model"), "saved_ckpts")
    assert os.path.exists(os.path.join(saved, "saved_info.txt"))
