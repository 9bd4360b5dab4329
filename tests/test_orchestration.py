"""The full user journey through the real entry points.

Runs `scripts/train.sh` (trainer + background evaluator daemon — the
reference's train/eval process split, train.sh:25-44) via subprocess on
a tiny synthetic config, then `cli.export_main`, asserting the artifacts
a user relies on: checkpoints, eval CSV/HTML/JSONL, best-ckpt promotion,
and the detections JSON.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from cap2det_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PIPELINE = """
train_reader {
  cap2det_reader {
    input_pattern: "%(rec)s"
    is_training: true
    shuffle_buffer_size: 8
    batch_size: 4
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 64 } }
    max_num_proposals: 8
    batch_resize_scale_value: 1.0
  }
}
eval_reader {
  cap2det_reader {
    input_pattern: "%(rec)s"
    is_training: false
    batch_size: 1
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 64 } }
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
    midn_post_processor { max_size_per_class: 5 max_total_size: 10 }
    oicr_post_processor { max_size_per_class: 5 max_total_size: 10 }
    eval_min_dimension: 64
    label_extractor { groundtruth_extractor { label_file: '%(lab)s' } }
  }
}
train_config {
  max_steps: 6
  learning_rate: 0.01
  optimizer { adagrad {} }
  save_checkpoints_steps: 3
  log_step_count_steps: 3
}
eval_config { steps: 8 }
"""


@pytest.mark.slow
def test_train_sh_then_export(tmp_path):
    classes = ["redthing", "greenthing"]
    record = str(tmp_path / "train.record")
    synthetic.write_localizable_dataset(
        record, num_examples=8, seed=4, classes=classes,
        image_hw=(96, 128), num_distractors=7,
    )
    label_file = synthetic.write_label_file(str(tmp_path / "labels.txt"),
                                            classes)
    # train.sh resolves configs/<name>.pbtxt relative to cwd; stage a
    # config dir in tmp alongside symlinked scripts.
    (tmp_path / "configs").mkdir()
    with open(str(tmp_path / "configs" / "smoke.pbtxt"), "w") as fid:
        fid.write(PIPELINE % {"rec": record, "lab": label_file})

    env = dict(os.environ)
    # Disable the axon TPU hook so plain JAX_PLATFORMS works in children
    # (see .claude/skills/verify/SKILL.md).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    model_dir = str(tmp_path / "model")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "train.sh"), "smoke",
         model_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=480,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    # Trainer artifacts.
    assert os.path.isdir(os.path.join(model_dir, "ckpt", "6")), os.listdir(
        os.path.join(model_dir, "ckpt")
    )
    assert os.path.exists(os.path.join(model_dir, "metrics.jsonl"))
    # The background daemon is best-effort (train.sh kills it when the
    # trainer exits; with 6 fast steps it may not finish a pass) — the
    # deterministic eval surface is eval_once:
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "eval_once.sh"), "smoke",
         model_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=480,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.exists(os.path.join(model_dir, "eval_metrics.jsonl"))
    reports = [f for f in os.listdir(model_dir)
               if f.startswith("eval_report_") and f.endswith(".csv")]
    assert reports, os.listdir(model_dir)
    assert os.path.exists(
        os.path.join(model_dir, "saved_ckpts", "saved_info.txt")
    )

    # Export CLI on the trained model.
    out_json = str(tmp_path / "detections.json")
    out = subprocess.run(
        [sys.executable, "-m", "cap2det_tpu.cli.export_main",
         "--pipeline_proto", str(tmp_path / "configs" / "smoke.pbtxt"),
         "--model_dir", model_dir,
         "--output_json", out_json, "--max_examples", "3"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    detections = json.load(open(out_json))
    entries = (list(detections.values())
               if isinstance(detections, dict) else detections)
    assert len(entries) == 3
    first = entries[0]
    assert {"detection_boxes", "detection_scores",
            "detection_classes"} <= set(first)
    boxes = np.asarray(first["detection_boxes"], np.float32)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
