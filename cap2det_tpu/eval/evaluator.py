"""Evaluation driver: multi-scale prediction, per-iteration VOC metrics,
continuous checkpoint polling, best-model promotion.

Mirrors the reference evaluator daemon (train/predict.py:328-611):
  * polls the checkpoint dir, evaluates each new checkpoint,
  * one detection evaluator per OICR iteration (+1 for the MIDN stage),
  * multi-scale test-time inference: per ``eval_min_dimension`` the image
    is re-resized and per-iteration proposal scores are averaged before
    NMS (reference cap2det_model.py:231-272),
  * optional COCO->VOC class remap (``eval_coco_on_voc``),
  * metrics to JSONL/TensorBoard + CSV report, best checkpoint promoted
    via saved_info.txt bookkeeping.

Coordinates: with eval batch 1 the reference's padded batch is a no-op,
so proposals/GT are true-image-normalized; we evaluate in those
coordinates directly (IoU is invariant to the absolute-pixel conversion
the reference applies, train/predict.py:377-415).
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from cap2det_tpu.config import schema
from cap2det_tpu.data import pipeline as pipeline_lib
from cap2det_tpu.eval import voc_eval
from cap2det_tpu.fields import DetectionFields, InputFields
from cap2det_tpu.models import registry
from cap2det_tpu.train import checkpoint as ckpt_lib

log = logging.getLogger("cap2det.eval")


class MultiScalePredictor:
    """Runs jitted per-scale score computation + NMS for one example."""

    def __init__(self, model, params, reader_cfg: schema.Cap2DetReader,
                 aspect_cap=1.5, canvas_multiple=32):
        self._model = model
        self._params = params
        self._reader = reader_cfg
        self._aspect_cap = aspect_cap
        self._multiple = canvas_multiple

        min_dims = list(model.options.eval_min_dimension)
        if not min_dims:
            resizer = reader_cfg.image_resizer
            if resizer and resizer.which_oneof() == "keep_aspect_ratio_resizer":
                min_dims = [resizer.keep_aspect_ratio_resizer.min_dimension]
            else:
                min_dims = [600]
        self._min_dims = min_dims

        self._jit_scores = jax.jit(
            lambda p, b: {
                k: v
                for k, v in model.predictions(p, b, is_training=False).items()
                if k in set(model.score_keys())
            }
        )
        self._jit_post = jax.jit(
            lambda scores, props, n: model.postprocess(
                scores, props, num_proposals=n
            )
        )

    def update_params(self, params):
        self._params = params

    def predict(self, example):
        """Returns a per-image dict of detections per OICR iteration."""
        image = pipeline_lib.decode_jpeg(example["image_encoded"])
        h, w = image.shape[:2]
        landscape = w >= h
        max_p = self._reader.max_num_proposals
        props_true = np.zeros((max_p, 4), np.float32)
        n_props = min(len(example["proposals"]), max_p)
        props_true[:n_props] = example["proposals"][:n_props]

        score_sum = None
        for min_dim in self._min_dims:
            short, long = pipeline_lib.compute_canvas(
                min_dim, 1.0, self._aspect_cap, self._multiple
            )
            ch, cw = (short, long) if landscape else (long, short)
            canvas, (new_h, new_w) = pipeline_lib.fit_image_to_canvas(
                image, (ch, cw)
            )
            fy, fx = new_h / ch, new_w / cw
            scale_vec = np.array([fy, fx, fy, fx], np.float32)
            if (canvas.dtype == np.uint8 and canvas.shape[0] % 2 == 0
                    and canvas.shape[1] % 2 == 0):
                # Host-side space-to-depth, matching the training feed
                # (cap2det.device_batch): uint8 pixels are exact (the
                # forward casts up) at half the f16 wire bytes, and the
                # stem runs the faster regrouped stride-1 conv. Canvas
                # sides are multiples of 32, so this always applies.
                from cap2det_tpu import native as native_lib

                if native_lib.available():
                    pixels = native_lib.pack_s2d(canvas, canvas.shape[:2])[None]
                else:
                    from cap2det_tpu.models import inception_v2

                    pixels = np.ascontiguousarray(
                        inception_v2.space_to_depth(canvas[None])
                    )
            else:
                pixels = canvas[None].astype(np.float16)
                if canvas.shape[0] % 2 == 0 and canvas.shape[1] % 2 == 0:
                    from cap2det_tpu.models import inception_v2

                    pixels = np.ascontiguousarray(
                        inception_v2.space_to_depth(pixels)
                    )
            batch = {
                # uint8 (or f16) pixels: minimizes the per-scale
                # host->device transfer (the eval daemon's dominant cost
                # on thin links); exact at bf16-conv precision.
                "image": pixels,
                "proposals": (props_true * scale_vec)[None],
                "num_proposals": np.array([n_props], np.int32),
            }
            scores = self._jit_scores(self._params, batch)
            scores = {k: np.asarray(v) for k, v in scores.items()}
            if score_sum is None:
                score_sum = scores
            else:
                score_sum = {k: score_sum[k] + scores[k] for k in score_sum}

        score_mean = {k: v / len(self._min_dims) for k, v in score_sum.items()}
        results = self._jit_post(
            score_mean, props_true[None], np.array([n_props], np.int32)
        )
        out = {k: np.asarray(v)[0] for k, v in results.items()}
        out["image_id"] = example["image_id"]
        out["image_hw"] = (h, w)
        out["proposal_scores"] = score_mean
        out["num_proposals"] = n_props
        out["proposals"] = props_true
        return out


def build_detection_evaluators(model, eval_coco_on_voc=False,
                               evaluator_kind="pascal"):
    """One evaluator per OICR iteration (reference predict.py:565-576).

    ``evaluator_kind`` selects the metric protocol ('pascal' or 'coco'),
    mirroring the reference's ``--evaluator`` flag.
    """
    if eval_coco_on_voc:
        from cap2det_tpu.data.synthetic import VOC_CLASSES

        categories = [
            {"id": i + 1, "name": name} for i, name in enumerate(VOC_CLASSES)
        ]
    else:
        categories = [
            {"id": i + 1, "name": name}
            for i, name in enumerate(model.label_extractor.classes)
        ]
    n = 1 + model.options.oicr_iterations
    if evaluator_kind == "coco":
        from cap2det_tpu.eval import coco_eval

        return [
            coco_eval.CocoDetectionEvaluator(categories) for _ in range(n)
        ], categories
    if evaluator_kind != "pascal":
        raise ValueError("unknown evaluator kind %r" % evaluator_kind)
    return [
        voc_eval.PascalDetectionEvaluator(categories) for _ in range(n)
    ], categories


def run_text_evaluation(pipeline_config, params, model=None,
                        max_eval_examples=None):
    """Text-model evaluation: precision/recall at thresholds and @k
    (reference models/text_model.py:84-126)."""
    if model is None:
        model = registry.build(pipeline_config.model, is_training=False)
    pipe = pipeline_lib.build_input_pipeline(
        pipeline_config.eval_reader, **model.pipeline_kwargs()
    )
    metrics = model.make_metrics()
    count = 0
    for host_batch in pipe:
        batch = model.device_batch(host_batch)
        model.evaluate_batch(metrics, params, batch)
        # Count EXAMPLES (the detection path's unit), not batches.
        count += len(host_batch[InputFields.image_id])
        if max_eval_examples and count >= max_eval_examples:
            break
    result = metrics.result()
    result["num_examples"] = count
    # The promotion metric: recall at the 0.5 threshold.
    return result, [result["metrics/recall_at_0.5"]]


def run_evaluation(
    pipeline_config: schema.Pipeline,
    params,
    model=None,
    max_eval_examples=None,
    eval_coco_on_voc=False,
    visualize_fn=None,
    evaluator_kind="pascal",
    predictor=None,
):
    """Single evaluation pass. Returns (metrics dict, per-iteration mAP list).

    Pass a `predictor` (with update_params already called) when evaluating
    many checkpoints — rebuilding it re-jits the multi-scale forward pass
    for every canvas shape, minutes of compile per poll on TPU.
    """
    if model is None:
        model = registry.build(pipeline_config.model, is_training=False)
    if not hasattr(model, "postprocess"):  # text model family
        return run_text_evaluation(
            pipeline_config, params, model=model,
            max_eval_examples=max_eval_examples,
        )
    reader_cfg = pipeline_config.eval_reader.cap2det_reader
    pipe = pipeline_lib.InputPipeline(reader_cfg, prefetch=0)
    if predictor is None:
        predictor = MultiScalePredictor(model, params, reader_cfg)
    else:
        predictor.update_params(params)
    evaluators, categories = build_detection_evaluators(
        model, eval_coco_on_voc, evaluator_kind
    )
    category_to_id = {c["name"]: c["id"] for c in categories}

    count = 0
    total_gt = 0
    for example in pipe.example_stream():
        if example.get("image_encoded") is None:
            continue
        result = predictor.predict(example)

        gt_sel = [
            (box, category_to_id[text])
            for box, text in zip(example["object_boxes"], example["object_texts"])
            if text in category_to_id
        ]
        gt_boxes = np.array([b for b, _ in gt_sel], np.float32).reshape(-1, 4)
        gt_classes = np.array([c for _, c in gt_sel], np.int64)
        total_gt += len(gt_sel)

        # COCO metrics split by absolute pixel area; convert from
        # normalized coordinates (IoU itself is scale-invariant).
        abs_vec = np.ones(4, np.float32)
        if evaluator_kind == "coco":
            ih, iw = result["image_hw"]
            abs_vec = np.array([ih, iw, ih, iw], np.float32)
        gt_boxes = gt_boxes * abs_vec

        for i, evaluator in enumerate(evaluators):
            suffix = "_at_%d" % i
            n = int(result[DetectionFields.num_detections + suffix])
            boxes = result[DetectionFields.detection_boxes + suffix][:n]
            scores = result[DetectionFields.detection_scores + suffix][:n]
            classes = result[DetectionFields.detection_classes + suffix][:n]
            if eval_coco_on_voc:
                boxes, scores, classes = voc_eval.convert_coco_result_to_voc(
                    boxes, scores, classes
                )
            boxes = np.asarray(boxes, np.float32).reshape(-1, 4) * abs_vec
            evaluator.add_single_ground_truth_image_info(
                result["image_id"],
                {
                    "groundtruth_boxes": gt_boxes,
                    "groundtruth_classes": gt_classes,
                    "groundtruth_difficult": np.zeros(len(gt_boxes), bool),
                },
            )
            evaluator.add_single_detected_image_info(
                result["image_id"],
                {
                    "detection_boxes": boxes,
                    "detection_scores": scores,
                    "detection_classes": classes,
                },
            )
        if visualize_fn is not None:
            visualize_fn(example, result)
        count += 1
        if max_eval_examples and count >= max_eval_examples:
            break

    if count and not total_gt:
        log.warning(
            "evaluated %d examples but matched ZERO ground-truth texts to "
            "the label map — mAP will be NaN; check that object_text values "
            "match the label file's class names", count,
        )
    metrics = {}
    map_per_iter = []
    for i, evaluator in enumerate(evaluators):
        res = evaluator.evaluate()
        for k, v in res.items():
            metrics["iter%d/%s" % (i, k)] = v
        if evaluator_kind == "coco":
            map_key = [k for k in res if k.endswith("_Precision/mAP")][0]
        else:
            map_key = [k for k in res if k.endswith("mAP@0.5IOU")][0]
        map_per_iter.append(res[map_key])
    metrics["num_examples"] = count
    return metrics, map_per_iter


def write_csv_report(path, metrics):
    with open(path, "w") as fid:
        for key in sorted(metrics):
            fid.write("%s,%s\n" % (key, metrics[key]))


def continuous_evaluation(
    pipeline_config: schema.Pipeline,
    model_dir=None,
    max_eval_examples=None,
    eval_coco_on_voc=False,
    poll_interval_secs=10,
    min_eval_steps=0,
    max_idle_polls=None,
    evaluator_kind="pascal",
    evaluate_all=False,
):
    """Checkpoint-polling evaluation daemon (reference predict.py:578-611).

    With evaluate_all, each poll takes the OLDEST not-yet-evaluated
    retained checkpoint instead of the newest — walking the whole
    retained history to build a metric-vs-step curve after (or during)
    training. The reference daemon only ever polls the latest; this mode
    exists because a single exclusively-held chip cannot run train and
    eval processes concurrently, so the curve is reconstructed
    post-hoc from keep_checkpoint_max history.
    """
    model_dir = model_dir or pipeline_config.model_dir
    model = registry.build(pipeline_config.model, is_training=False)
    saved_dir = os.path.join(model_dir, "saved_ckpts")
    # Eval curves to TensorBoard beside the trainer's (reference
    # train/predict.py:491-496 writes per-iteration mAP/CorLoc summaries);
    # JSONL twin stays in eval_metrics.jsonl.
    from cap2det_tpu.train.metrics import MetricsWriter

    writer = MetricsWriter(
        model_dir, jsonl_name="eval_metrics.jsonl", tb_name="tb_eval"
    )
    try:
        return _poll_loop(
            pipeline_config, model, model_dir, saved_dir, writer,
            max_eval_examples=max_eval_examples,
            eval_coco_on_voc=eval_coco_on_voc,
            poll_interval_secs=poll_interval_secs,
            min_eval_steps=min_eval_steps,
            max_idle_polls=max_idle_polls,
            evaluator_kind=evaluator_kind,
            evaluate_all=evaluate_all,
        )
    finally:
        # Close on EVERY exit path (exceptions, SIGTERM-as-exception):
        # the JSONL handle and TB event writer would otherwise leak and
        # drop buffered events.
        writer.close()


def _poll_loop(
    pipeline_config,
    model,
    model_dir,
    saved_dir,
    writer,
    *,
    max_eval_examples,
    eval_coco_on_voc,
    poll_interval_secs,
    min_eval_steps,
    max_idle_polls,
    evaluator_kind,
    evaluate_all=False,
):
    evaluated = set()
    idle = 0
    best = None
    # Built once and reused across checkpoints: rebuilding re-jits the
    # multi-scale forward for every canvas shape at every poll.
    predictor = None
    if hasattr(model, "postprocess"):
        predictor = MultiScalePredictor(
            model, None, pipeline_config.eval_reader.cap2det_reader
        )
    while True:
        if evaluate_all:
            step, path = None, None
            for s_, p_ in ckpt_lib.list_checkpoints(model_dir):
                if s_ not in evaluated and s_ >= min_eval_steps:
                    step, path = s_, p_
                    break
        else:
            step, path = ckpt_lib.latest_checkpoint(model_dir)
        if step is None or step in evaluated or step < min_eval_steps:
            idle += 1
            if max_idle_polls is not None and idle > max_idle_polls:
                return best
            time.sleep(poll_interval_secs)
            continue
        idle = 0
        manager = ckpt_lib.CheckpointManager(model_dir)
        try:
            state = manager.restore(step=step)
        except Exception as exc:  # noqa: BLE001
            # Races the trainer's checkpoint GC (max_to_keep) when used
            # during training — especially evaluate_all, whose
            # oldest-first target is exactly the next deletion victim.
            # A deleted checkpoint never comes back: mark it evaluated
            # and move on instead of dying mid-curve.
            log.warning("checkpoint %s vanished before restore (%s); "
                        "skipping", step, exc)
            evaluated.add(step)
            continue
        finally:
            manager.close()
        # Evaluate the moving average when present (swapping-saver parity).
        params = state["ema"] if "ema" in state else state["params"]

        report = None
        visualize_fn = None
        if hasattr(model, "postprocess"):
            from cap2det_tpu.eval.html_report import HTMLReport

            report = HTMLReport(model.label_extractor.classes, max_examples=20)
            final_iter = model.options.oicr_iterations
            visualize_fn = lambda ex, res: report.add_example(  # noqa: E731
                ex, res, final_iter
            )
        eval_start = time.time()
        metrics, map_per_iter = run_evaluation(
            pipeline_config,
            params,
            model=model,
            max_eval_examples=max_eval_examples,
            eval_coco_on_voc=eval_coco_on_voc,
            visualize_fn=visualize_fn,
            evaluator_kind=evaluator_kind,
            predictor=predictor,
        )
        # Wall time per checkpoint: if this exceeds the trainer's
        # save_checkpoints_steps cadence the daemon silently skips
        # checkpoints and degrades best-ckpt selection — keep it visible.
        metrics["eval/seconds_per_checkpoint"] = time.time() - eval_start
        if report is not None:
            report.write(
                os.path.join(model_dir, "eval_report_%d.html" % step)
            )
        final_map = map_per_iter[-1]
        log.info("step %d mAP per iter: %s (%.1fs)", step, map_per_iter,
                 metrics["eval/seconds_per_checkpoint"])
        write_csv_report(
            os.path.join(model_dir, "eval_report_%d.csv" % step), metrics
        )
        writer.write(step, {
            k: float(v) for k, v in metrics.items()
            if isinstance(v, (int, float, np.floating))
        })
        ckpt_lib.save_model_if_it_is_better(
            step, final_map, path, saved_dir
        )
        evaluated.add(step)
        # Ties keep the LATEST step here; save_model_if_it_is_better uses
        # a strict > and keeps the earliest. Both are defensible; the
        # return value is informational while saved_ckpts/ is the durable
        # artifact, so the mismatch is harmless.
        if best is None or final_map >= best[1]:
            best = (step, final_map)
