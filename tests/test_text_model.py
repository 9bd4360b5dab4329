"""End-to-end text-model training on synthetic data (the minimum slice)."""

import numpy as np
import pytest

from cap2det_tpu.config import schema, pbtxt
from cap2det_tpu.data import synthetic
from cap2det_tpu.models import registry
from cap2det_tpu.train import checkpoint as ckpt_lib
from cap2det_tpu.train import trainer as trainer_lib

CLASSES = ["person", "dog", "car", "bird"]
FILLERS = ["a", "the", "on", "photo", "of", "with", "near", "sitting"]


@pytest.fixture(scope="module")
def text_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("text")
    record = str(d / "text.record-0")
    synthetic.write_synthetic_dataset(
        record, num_examples=64, seed=11, classes=CLASSES, with_image=False
    )
    label_file = synthetic.write_label_file(str(d / "labels.txt"), CLASSES)
    vocab_words = CLASSES + FILLERS
    vocab_file = str(d / "open_vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab_words))
    emb = np.random.RandomState(0).randn(len(vocab_words), 16).astype(np.float32)
    emb_file = str(d / "emb.npy")
    np.save(emb_file, emb)
    return d, record, label_file, vocab_file, emb_file


def _pipeline_cfg(record, label_file, vocab_file, emb_file, model_dir):
    text = """
    train_reader {
      cap2det_reader {
        decode_image: false
        input_pattern: "%(record)s"
        is_training: true
        shuffle_buffer_size: 16
        batch_size: 8
      }
    }
    eval_reader {
      cap2det_reader {
        decode_image: false
        input_pattern: "%(record)s"
        is_training: false
        batch_size: 1
      }
    }
    model {
      [TextModel.ext] {
        label_extractor { label_file: '%(label_file)s' }
        text_classifier {
          label_file: '%(label_file)s'
          open_vocabulary_file: '%(vocab_file)s'
          open_vocabulary_word_embedding_file: '%(emb_file)s'
          hidden_units: 32
          dropout_keep_proba: 1.0
          regularizer: 1e-6
          label_threshold: 0.5
        }
      }
    }
    train_config {
      max_steps: 150
      learning_rate: 0.5
      optimizer { adagrad {} }
      save_checkpoints_steps: 100
      log_step_count_steps: 50
      moving_average_decay: 0.0
    }
    eval_config { steps: 20 }
    """ % dict(
        record=record,
        label_file=label_file,
        vocab_file=vocab_file,
        emb_file=emb_file,
    )
    cfg = schema.loads_pipeline(text)
    object.__setattr__(cfg, "model_dir", model_dir)
    return cfg


def test_text_model_trains(text_setup, tmp_path):
    d, record, label_file, vocab_file, emb_file = text_setup
    model_dir = str(tmp_path / "model")
    cfg = _pipeline_cfg(record, label_file, vocab_file, emb_file, model_dir)

    losses = []
    hooks = [lambda step, state, logs: losses.append(float(logs["loss/total_loss"]))]
    state = trainer_lib.train(cfg, model_dir=model_dir, hooks=hooks)

    assert int(state["step"]) == 150
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.5, (early, late)

    # EMA with decay 0.0 is elided (shadow == params bit-for-bit in the
    # reference's MovingAverageOptimizer at decay 0, trainer._ema_decay):
    # eval_params serves the live params and no shadow tree is carried.
    assert "ema" not in state
    assert trainer_lib.eval_params(state) is state["params"]

    # Evaluation: quality on training data should be high.
    from cap2det_tpu.data import pipeline as pipeline_lib

    model = registry.build(cfg.model, is_training=False)
    pipe = pipeline_lib.build_input_pipeline(
        cfg.eval_reader, seed=0, **model.pipeline_kwargs()
    )
    metrics = model.make_metrics()
    params = trainer_lib.eval_params(state)
    for i, host_batch in enumerate(pipe):
        if i >= 32:
            break
        model.evaluate_batch(metrics, params, model.device_batch(host_batch))
    result = metrics.result()
    assert result["metrics/recall_at_0.5"] > 0.8, result
    assert result["metrics/precision_at_1"] > 0.8, result

    # Checkpoint restore round-trips.
    step, path = ckpt_lib.latest_checkpoint(model_dir)
    assert step == 150

    # The frozen embedding table must be untouched by training.
    emb0 = np.load(emb_file)
    np.testing.assert_allclose(
        np.asarray(state["params"]["word_embedding"]["weights"])[: len(emb0)],
        emb0,
        rtol=1e-6,
    )


def test_classifier_extractor_loads_trained_checkpoint(text_setup, tmp_path):
    """The text-classifier extractor warm-starts from a text-model ckpt."""
    d, record, label_file, vocab_file, emb_file = text_setup
    model_dir = str(tmp_path / "model2")
    cfg = _pipeline_cfg(record, label_file, vocab_file, emb_file, model_dir)
    state = trainer_lib.train(cfg, model_dir=model_dir, max_steps=150)

    params_path = str(tmp_path / "clf_params")
    ckpt_lib.save_params(params_path, trainer_lib.eval_params(state))

    ex_cfg = schema.TextClassifierMatchExtractor.from_dict(
        pbtxt.parse(
            """
            label_file: '%s'
            open_vocabulary_file: '%s'
            open_vocabulary_word_embedding_file: '%s'
            text_classifier_checkpoint_file: '%s'
            hidden_units: 32
            label_threshold: 0.5
            """
            % (label_file, vocab_file, emb_file, params_path)
        )
    )
    from cap2det_tpu.text import extractors

    ex = extractors.TextClassifierMatchExtractor(ex_cfg)
    # Exact match path.
    labels = ex.extract_labels([["person"]])
    np.testing.assert_array_equal(labels, [[1, 0, 0, 0]])
    # Classifier fallback: caption with no exact class tokens but learned
    # co-occurring context should still produce a valid multi-hot row.
    labels = ex.extract_labels([["photo", "of", "sitting"]])
    assert labels.shape == (1, 4)
    assert set(np.unique(labels)) <= {0.0, 1.0}
