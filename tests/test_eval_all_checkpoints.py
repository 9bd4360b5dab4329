"""--all_checkpoints curve reconstruction.

A single exclusively-held chip cannot run the trainer and the eval
daemon concurrently (probed on hardware; scripts/quality_run.sh), so
the evaluator can walk every retained checkpoint oldest-first to build
the metric-vs-step curve post-hoc. Exercised here with the text model
(cheap: no images) over two checkpoints.
"""

import json
import os

import jax
import numpy as np

from cap2det_tpu.config import schema
from cap2det_tpu.data import synthetic
from cap2det_tpu.eval import evaluator as evaluator_lib
from cap2det_tpu.train import checkpoint as ckpt_lib
from cap2det_tpu.train import trainer as trainer_lib
import cap2det_tpu.models  # noqa: F401

PIPELINE = """
train_reader {
  cap2det_reader {
    input_pattern: "%(record)s"
    is_training: true
    shuffle_buffer_size: 4
    batch_size: 4
    decode_image: false
    max_num_proposals: 4
  }
}
eval_reader {
  cap2det_reader {
    input_pattern: "%(record)s"
    is_training: false
    batch_size: 2
    decode_image: false
    max_num_proposals: 4
  }
}
model {
  [TextModel.ext] {
    label_extractor { label_file: '%(label_file)s' }
    text_classifier {
      label_file: '%(label_file)s'
      open_vocabulary_file: '%(vocab)s'
      open_vocabulary_word_embedding_file: '%(emb)s'
      hidden_units: 16
      dropout_keep_proba: 1.0
      regularizer: 1e-6
      label_threshold: 0.5
    }
  }
}
train_config {
  max_steps: 6
  learning_rate: 0.05
  optimizer { adagrad {} }
  save_checkpoints_steps: 3
  keep_checkpoint_max: 10
  log_step_count_steps: 3
}
eval_config { steps: 4 }
"""


def test_list_checkpoints_orders_ascending(tmp_path):
    root = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(root)
    for s in [300, 3, 30]:
        os.makedirs(os.path.join(root, str(s)))
    got = ckpt_lib.list_checkpoints(str(tmp_path))
    assert [s for s, _ in got] == [3, 30, 300]
    assert ckpt_lib.latest_checkpoint(str(tmp_path))[0] == 300


def test_evaluate_all_walks_every_checkpoint(tmp_path):
    classes = ["person", "dog"]
    label_file = synthetic.write_label_file(
        str(tmp_path / "labels.txt"), classes
    )
    vocab = str(tmp_path / "vocab.txt")
    words = ["person", "dog", "a", "photo", "of"]
    with open(vocab, "w") as fid:
        fid.write("\n".join(words))
    emb = str(tmp_path / "emb.npy")
    np.save(emb, np.random.RandomState(0).randn(len(words), 8)
            .astype(np.float32))
    record = str(tmp_path / "text.record")
    synthetic.write_synthetic_dataset(
        record, num_examples=8, seed=0, classes=classes, with_image=False,
    )
    cfg = schema.loads_pipeline(PIPELINE % {
        "record": record, "label_file": label_file, "vocab": vocab,
        "emb": emb,
    })
    model_dir = str(tmp_path / "model")
    trainer_lib.train(cfg, model_dir=model_dir, use_mesh=False)
    steps = [s for s, _ in ckpt_lib.list_checkpoints(model_dir)]
    assert steps == [3, 6]

    evaluator_lib.continuous_evaluation(
        cfg, model_dir=model_dir, max_idle_polls=0, evaluate_all=True,
        poll_interval_secs=0,
    )
    with open(os.path.join(model_dir, "eval_metrics.jsonl")) as fid:
        rows = [json.loads(l) for l in fid if l.strip()]
    # One curve point per retained checkpoint, oldest first.
    assert [r["step"] for r in rows] == [3, 6]
