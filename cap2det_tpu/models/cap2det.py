"""Cap2Det: the flagship weakly-supervised detector.

Composition (reference models/cap2det_model.py:29-346): FRCNN proposal
features -> MIDN two-branch head + K OICR refinement heads; loss = MIDN
sigmoid CE against caption-extracted labels + per-iteration OICR CE;
postprocess = per-iteration class-wise NMS (iteration 0 scored by MIDN,
k>0 by softmax(1+C)[..., 1:]). Multi-scale evaluation means per-scale
proposal scores before NMS (reference :231-272).

TPU-first structure: one jitted loss over static [B, P] shapes; label
extraction already ran in the input pipeline (pseudo_labels in the
batch); multi-scale eval is a host loop over per-scale canvases feeding
the same jitted score function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cap2det_tpu.config import schema
from cap2det_tpu.fields import Cap2DetPredictions, DetectionFields, InputFields
from cap2det_tpu.models import frcnn, wsod
from cap2det_tpu.models.registry import register_model_class
from cap2det_tpu.ops import losses as loss_ops
from cap2det_tpu.ops import masked, nms
from cap2det_tpu.text import extractors as extractors_lib


class Cap2DetModel:
    non_trainable_paths = ("word_embedding",)
    non_trainable_substrings = ("/BatchNorm/moving_",)

    def __init__(self, options: schema.Cap2DetModel, is_training=False,
                 compute_dtype=jnp.bfloat16, use_pallas=None):
        self._options = options
        self._is_training = is_training
        self._compute_dtype = compute_dtype
        self._use_pallas = use_pallas
        self.label_extractor = extractors_lib.build_label_extractor(
            options.label_extractor
        )
        self._midn_post = nms.build_post_processor(options.midn_post_processor)
        self._oicr_post = nms.build_post_processor(options.oicr_post_processor)

        stddev = 0.01
        hp = options.fc_hyperparams
        if hp and hp.initializer and hp.initializer.truncated_normal_initializer:
            stddev = hp.initializer.truncated_normal_initializer.stddev
        self._fc_stddev = stddev
        self._fc_l2 = 0.0
        if hp and hp.regularizer and hp.regularizer.l2_regularizer:
            self._fc_l2 = hp.regularizer.l2_regularizer.weight

    @property
    def options(self):
        return self._options

    @property
    def num_classes(self):
        return self.label_extractor.num_classes

    def pipeline_kwargs(self):
        # pack_s2d: the pipeline's parallel workers emit the packed uint8
        # training-feed layout directly (pack_image_to_canvas), so
        # device_batch is a passthrough on the feed thread.
        return {"label_extractor": self.label_extractor, "pack_s2d": True}

    # -- params ----------------------------------------------------------------

    def init_params(self, rng):
        r_frcnn, r_midn1, r_midn2, *r_oicr = jax.random.split(
            rng, 3 + self._options.oicr_iterations
        )
        feature_dim = 1024
        params = frcnn.init_params(r_frcnn, self._options.frcnn_options)
        params["midn"] = {
            "proba_r_given_c": wsod.init_fc(
                r_midn1, feature_dim, self.num_classes, self._fc_stddev
            ),
            "proba_c_given_r": wsod.init_fc(
                r_midn2, feature_dim, self.num_classes, self._fc_stddev
            ),
        }
        params["oicr"] = {
            "iter%d" % (i + 1): wsod.init_fc(
                r, feature_dim, 1 + self.num_classes, self._fc_stddev
            )
            for i, r in enumerate(r_oicr)
        }
        return params

    def load_pretrained(self, params, converted_checkpoint):
        return frcnn.load_pretrained(params, converted_checkpoint)

    # -- batches ----------------------------------------------------------------

    def device_batch(self, host_batch):
        from cap2det_tpu.models import inception_v2

        image = np.asarray(host_batch[InputFields.image])
        packable = (
            image.shape[-1] == 3
            and image.shape[1] % 2 == 0
            and image.shape[2] % 2 == 0
        )
        if image.dtype == np.uint8:
            # uint8 canvases (the pipeline's native layout since r5) ship
            # as-is: exact — the forward casts up on device — at HALF the
            # f16 wire bytes and with zero host float math (the f32->f16
            # canvas cast alone cost ~19 ms/image). When the pipeline
            # already packed (pack_s2d, trailing dim 12) this is a pure
            # passthrough; an unpacked uint8 canvas is packed here.
            if packable:
                image = self._pack_u8(image)
        else:
            image = image.astype(np.float16)
            if packable:
                # Host-side space-to-depth: ship [B, H/2, W/2, 12]
                # canvases. Same bytes on the wire, but the stem's
                # stride-2 conv runs as the 2.2x-faster regrouped
                # stride-1 conv with NO on-device repacking transpose
                # (inception_v2._s2d_pack_weights; the device-side
                # packing variant measured a net loss, BENCH_NOTES.md
                # round 3).
                image = np.ascontiguousarray(
                    inception_v2.space_to_depth(image)
                )
        return {
            # Pixels ship as uint8 (or float16 for float feeds): exact
            # for 0-255 integers and well beyond the bf16 precision the
            # convs run at; minimizes the host->device transfer — which
            # dominates the e2e loop on thin links (BENCH_NOTES.md
            # round 3). The forward casts up.
            "image": image,
            "proposals": np.asarray(host_batch[InputFields.proposals]),
            "num_proposals": np.asarray(host_batch[InputFields.num_proposals]),
            "labels": np.asarray(
                host_batch[InputFields.pseudo_labels], np.float32
            ),
        }

    @staticmethod
    def _pack_u8(image):
        """[B, H, W, 3] uint8 -> [B, H/2, W/2, 12] space-to-depth packed,
        native kernel per element with a numpy fallback."""
        try:
            from cap2det_tpu import native

            if native.available():
                h, w = image.shape[1:3]
                return np.stack(
                    [native.pack_s2d(im, (h, w)) for im in image]
                )
        except Exception:  # pragma: no cover - fall back quietly
            pass
        from cap2det_tpu.models import inception_v2

        return np.ascontiguousarray(inception_v2.space_to_depth(image))

    # -- forward ----------------------------------------------------------------

    def predictions(self, params, batch, *, is_training=False, rng=None):
        """Computes MIDN/OICR scores (reference _build_prediction:152-216)."""
        proposals = batch["proposals"]
        num_proposals = batch["num_proposals"]
        mask = masked.sequence_mask(
            num_proposals, maxlen=proposals.shape[1], dtype=jnp.float32
        )

        features = frcnn.extract_features(
            params,
            batch["image"],
            proposals,
            self._options.frcnn_options,
            is_training=is_training,
            dropout_rng=rng,
            compute_dtype=self._compute_dtype,
            use_pallas=self._use_pallas,
        )

        class_logits, proposal_scores, proba_r_given_c = wsod.midn_head(
            params["midn"], features, mask
        )
        preds = {
            Cap2DetPredictions.midn_class_logits: class_logits,
            Cap2DetPredictions.midn_proba_r_given_c: proba_r_given_c,
            Cap2DetPredictions.oicr_proposal_scores + "_at_0": proposal_scores,
            DetectionFields.proposal_boxes: proposals,
            DetectionFields.num_proposals: num_proposals,
            "proposal_mask": mask,
        }
        for i in range(self._options.oicr_iterations):
            preds[
                Cap2DetPredictions.oicr_proposal_scores + "_at_%d" % (i + 1)
            ] = wsod.fc(params["oicr"]["iter%d" % (i + 1)], features)
        return preds

    def loss(self, params, batch, rng=None, is_training=True):
        """Total loss (reference build_loss:274-330)."""
        options = self._options
        preds = self.predictions(
            params, batch, is_training=is_training, rng=rng
        )
        labels = batch["labels"]
        loss_dict = {}

        midn_ce = loss_ops.sigmoid_cross_entropy(
            labels, preds[Cap2DetPredictions.midn_class_logits]
        ).mean()
        loss_dict["midn_cross_entropy_loss"] = midn_ce * options.midn_loss_weight

        proposals = preds[DetectionFields.proposal_boxes]
        mask = preds["proposal_mask"]
        batch_size, max_proposals = mask.shape

        scores_0 = preds[Cap2DetPredictions.oicr_proposal_scores + "_at_0"]
        if options.oicr_use_proba_r_given_c:
            scores_0 = preds[Cap2DetPredictions.midn_proba_r_given_c]
        scores_0 = jnp.concatenate(
            [jnp.zeros((batch_size, max_proposals, 1), scores_0.dtype), scores_0],
            axis=-1,
        )

        for i in range(options.oicr_iterations):
            scores_1 = preds[
                Cap2DetPredictions.oicr_proposal_scores + "_at_%d" % (i + 1)
            ]
            ce = wsod.oicr_loss(
                labels,
                proposals,
                scores_0,
                scores_1,
                mask,
                iou_threshold=options.oicr_iou_threshold,
            )
            loss_dict["oicr_cross_entropy_loss_at_%d" % (i + 1)] = (
                ce * options.oicr_loss_weight
            )
            scores_0 = jax.nn.softmax(scores_1, axis=-1)

        total = sum(loss_dict.values())
        if self._fc_l2 > 0:
            reg = loss_ops.l2_regularization(
                {"midn": params["midn"], "oicr": params["oicr"]}, self._fc_l2
            )
            loss_dict["regularization_loss"] = reg
            total = total + reg
        return total, loss_dict

    # -- postprocess / eval ------------------------------------------------------

    def postprocess(self, score_dict, proposals, num_proposals=None):
        """Per-iteration NMS (reference _postprocess:111-150).

        Args:
          score_dict: {'..._at_k': [B, P, C or 1+C] arrays} (host or device).
          proposals: [B, P, 4].
          num_proposals: optional [B] valid-proposal counts. The reference
            never sees padding here (its batch-1 eval pads to the actual
            count); we pad to the static max_num_proposals, so padded
            slots must be masked out of NMS or the zero boxes win.

        Returns dict of detections keyed by iteration suffix.
        """
        results = {}
        valid = None
        if num_proposals is not None:
            valid = masked.sequence_mask(
                num_proposals, maxlen=proposals.shape[1], dtype=jnp.float32
            )[:, :, None]
        for i in range(1 + self._options.oicr_iterations):
            scores = score_dict[
                Cap2DetPredictions.oicr_proposal_scores + "_at_%d" % i
            ]
            if i == 0:
                post_fn = self._midn_post
            else:
                post_fn = self._oicr_post
                scores = jax.nn.softmax(scores, axis=-1)[:, :, 1:]
            if valid is not None:
                scores = scores * valid
            num, boxes, det_scores, det_classes = post_fn(proposals, scores)
            suffix = "_at_%d" % i
            results[DetectionFields.num_detections + suffix] = num
            results[DetectionFields.detection_boxes + suffix] = boxes
            results[DetectionFields.detection_scores + suffix] = det_scores
            results[DetectionFields.detection_classes + suffix] = det_classes
        return results

    def score_keys(self):
        return [
            Cap2DetPredictions.oicr_proposal_scores + "_at_%d" % i
            for i in range(1 + self._options.oicr_iterations)
        ]


register_model_class(schema.Cap2DetModel, Cap2DetModel)
