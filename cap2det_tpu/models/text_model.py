"""Text-classifier model: the first end-to-end slice.

Trains the GloVe -> FC -> masked-max -> ReLU -> dropout -> FC classifier
against GroundtruthExtractor labels with sigmoid cross-entropy (reference
models/text_model.py:31-129). Its checkpoint warm-starts the
TextClassifierMatchExtractor inside Cap2Det
(models/label_extractor.py:455-457).

Pure-functional: params are a dict pytree, the loss is jittable, and the
host input pipeline supplies token ids + labels (no strings on device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cap2det_tpu.config import schema
from cap2det_tpu.fields import InputFields
from cap2det_tpu.models.registry import register_model_class
from cap2det_tpu.text import classifier as classifier_lib
from cap2det_tpu.text import extractors as extractors_lib

from cap2det_tpu.ops.losses import sigmoid_cross_entropy

FIELD_LOGITS = "logits"
FIELD_TEXT_LOSS = "text_cross_entropy_loss"


class TextModel:
    non_trainable_paths = ("word_embedding",)

    def __init__(self, options: schema.TextModel, is_training=False):
        self._options = options
        self._is_training = is_training
        self.label_extractor = extractors_lib.GroundtruthExtractor(
            options.label_extractor
        )
        self.text_classifier = extractors_lib.TextClassifierMatchExtractor(
            options.text_classifier
        )

    @property
    def num_classes(self):
        return self.label_extractor.num_classes

    @property
    def vocab(self):
        return self.text_classifier.vocab

    def init_params(self, rng):
        return self.text_classifier.init_params(rng)

    def pipeline_kwargs(self):
        """Extras the input pipeline needs for this model."""
        return {
            "label_extractor": self.label_extractor,
            "vocab": self.text_classifier.vocab,
        }

    def device_batch(self, host_batch):
        # Plain numpy: the trainer decides device placement (single device
        # or sharded over the mesh).
        return {
            "token_ids": np.asarray(
                host_batch[InputFields.concat_caption_token_ids]
            ),
            "labels": np.asarray(host_batch[InputFields.pseudo_labels]),
        }

    def predict_logits(self, params, batch, rng=None, is_training=False):
        return self.text_classifier.predict_logits(
            batch["token_ids"],
            params=params,
            is_training=is_training,
            dropout_rng=rng,
        )

    def loss(self, params, batch, rng=None, is_training=True):
        """Returns (total_loss, loss_dict)."""
        logits = self.predict_logits(params, batch, rng=rng, is_training=is_training)
        ce = sigmoid_cross_entropy(batch["labels"], logits).mean()
        reg_scale = self._options.text_classifier.regularizer
        tc = params["text_classifier"]
        reg = reg_scale * 0.5 * (
            jnp.sum(jnp.square(tc["layer1"]["weights"]))
            + jnp.sum(jnp.square(tc["layer2"]["weights"]))
        )
        total = ce + reg
        return total, {FIELD_TEXT_LOSS: ce, "regularization_loss": reg}

    # -- evaluation ------------------------------------------------------------

    def make_metrics(self):
        return _TextMetrics()

    def evaluate_batch(self, metrics, params, batch):
        logits = np.asarray(self.predict_logits(params, batch, is_training=False))
        labels = np.asarray(batch["labels"])
        metrics.update(labels, logits)


class _TextMetrics:
    """Streaming precision/recall at thresholds {.3,.5,.7} and @k {1,5}
    (reference models/text_model.py:105-126)."""

    THRESHOLDS = (0.3, 0.5, 0.7)
    KS = (1, 5)

    def __init__(self):
        self.tp = {t: 0 for t in self.THRESHOLDS}
        self.pred_pos = {t: 0 for t in self.THRESHOLDS}
        self.actual_pos = 0
        self.topk_tp = {k: 0 for k in self.KS}
        self.topk_pred = {k: 0 for k in self.KS}
        self.topk_actual = 0

    def update(self, labels, logits):
        probs = 1.0 / (1.0 + np.exp(-logits))
        positives = labels > 0
        self.actual_pos += int(positives.sum())
        for t in self.THRESHOLDS:
            pred = probs > t
            self.tp[t] += int((pred & positives).sum())
            self.pred_pos[t] += int(pred.sum())
        order = np.argsort(-logits, axis=-1)
        for k in self.KS:
            topk = np.zeros_like(positives)
            np.put_along_axis(topk, order[:, :k], True, axis=-1)
            self.topk_tp[k] += int((topk & positives).sum())
            self.topk_pred[k] += int(topk.sum())
        self.topk_actual += int(positives.sum())

    def result(self):
        out = {}
        for t in self.THRESHOLDS:
            out["metrics/precision_at_%s" % t] = self.tp[t] / max(self.pred_pos[t], 1)
            out["metrics/recall_at_%s" % t] = self.tp[t] / max(self.actual_pos, 1)
        for k in self.KS:
            out["metrics/precision_at_%d" % k] = (
                self.topk_tp[k] / max(self.topk_pred[k], 1)
            )
            out["metrics/recall_at_%d" % k] = (
                self.topk_tp[k] / max(self.topk_actual, 1)
            )
        return out


register_model_class(schema.TextModel, TextModel)
