"""Eval-daemon wall-time benchmark: seconds per checkpoint at paper shapes.

The continuous evaluator (cap2det_tpu/eval/evaluator.py, mirroring the
reference train/predict.py daemon) runs multi-scale batch-1 inference per
example. If one checkpoint's evaluation takes longer than the trainer's
`save_checkpoints_steps` cadence produces checkpoints, the daemon skips
checkpoints and best-ckpt selection degrades — this tool measures that
wall time on the real TPU and extrapolates to the VOC07 test set
(4,952 images, BASELINE.md).

Usage: python tools/bench_eval.py [--examples 8] [--proposals 2000]
Prints JSON lines; record results in BENCH_NOTES.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOC07_TEST_IMAGES = 4952


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--examples", type=int, default=8)
    parser.add_argument("--proposals", type=int, default=2000)
    parser.add_argument(
        "--min_dims", default="1200,800,600,400",
        help="eval_min_dimension multi-scale set (voc07_inc2 defaults)",
    )
    args = parser.parse_args()

    import jax
    import numpy as np

    from cap2det_tpu.config import schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.eval import evaluator as evaluator_lib
    from cap2det_tpu.models import registry
    import cap2det_tpu.models  # noqa: F401

    work = tempfile.mkdtemp(prefix="bench_eval_")
    classes = list(synthetic.VOC_CLASSES)
    record = os.path.join(work, "eval.record")
    # COCO/VOC-like source sizes; the predictor rescales to each min-dim.
    synthetic.write_synthetic_dataset(
        record, num_examples=args.examples, seed=3, classes=classes,
        image_hw=(480, 640), num_proposals=args.proposals,
    )
    label_file = synthetic.write_label_file(
        os.path.join(work, "labels.txt"), classes
    )
    min_dims = [int(d) for d in args.min_dims.split(",")]

    cfg = schema.loads_pipeline(
        """
        eval_reader {
          cap2det_reader {
            input_pattern: "%(record)s"
            is_training: false
            batch_size: 1
            image_resizer { keep_aspect_ratio_resizer { min_dimension: 1000 } }
            max_num_proposals: %(proposals)d
          }
        }
        model {
          [Cap2DetModel.ext] {
            frcnn_options {
              feature_extractor { type: 'faster_rcnn_inception_v2' }
              initial_crop_size: 14
              maxpool_kernel_size: 2
              maxpool_stride: 2
              dropout_keep_prob: 1.0
              dropout_on_feature_map: false
            }
            fc_hyperparams {
              initializer { truncated_normal_initializer { stddev: 0.01 } }
            }
            oicr_iterations: 3
            midn_post_processor {
              score_thresh: 0.00001 iou_thresh: 0.4
              max_size_per_class: 100 max_total_size: 300
            }
            oicr_post_processor {
              score_thresh: 0.00001 iou_thresh: 0.3
              max_size_per_class: 100 max_total_size: 300
            }
            %(min_dim_lines)s
            label_extractor {
              groundtruth_extractor { label_file: '%(label_file)s' }
            }
          }
        }
        """
        % {
            "record": record,
            "proposals": args.proposals,
            "label_file": label_file,
            "min_dim_lines": "\n".join(
                "eval_min_dimension: %d" % d for d in min_dims
            ),
        }
    )
    model = registry.build(cfg.model, is_training=False)
    params = model.init_params(jax.random.PRNGKey(0))

    from cap2det_tpu.data import pipeline as pipeline_lib

    reader_cfg = cfg.eval_reader.cap2det_reader
    predictor = evaluator_lib.MultiScalePredictor(model, params, reader_cfg)
    pipe = pipeline_lib.InputPipeline(reader_cfg, prefetch=0)
    examples = list(pipe.example_stream())

    # Warm pass: compiles one program per (scale, orientation) canvas.
    t0 = time.time()
    predictor.predict(examples[0])
    compile_s = time.time() - t0

    t0 = time.time()
    n = 0
    for ex in examples[1:]:
        predictor.predict(ex)
        n += 1
    per_example = (time.time() - t0) / max(n, 1)

    # Device-resident per-scale forward (excludes host pipeline + H2D):
    # the compute-bound floor a locally-attached host would see.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchlib import slope_time

    img = pipeline_lib.decode_jpeg(examples[0]["image_encoded"])
    short, long_ = pipeline_lib.compute_canvas(max(min_dims), 1.0, 1.5, 32)
    canvas, _ = pipeline_lib.fit_image_to_canvas(img, (short, long_))
    device_batch = jax.device_put({
        "image": canvas[None].astype(np.float16),
        "proposals": np.zeros((1, args.proposals, 4), np.float32),
        "num_proposals": np.array([args.proposals], np.int32),
    })
    fn = predictor._jit_scores
    params = predictor._params
    per_scale_device = slope_time(fn, (params, device_batch), steps=6)

    # Full pass: predict + metric accumulation + AP computation.
    t0 = time.time()
    metrics, map_per_iter = evaluator_lib.run_evaluation(
        cfg, params, model=model, predictor=predictor
    )
    full_pass = time.time() - t0

    print(json.dumps({
        "metric": "eval_seconds_per_example_multiscale",
        "value": round(per_example, 4),
        "min_dims": min_dims,
        "proposals": args.proposals,
        "first_example_incl_compile_s": round(compile_s, 1),
        "examples_measured": n,
    }))
    print(json.dumps({
        "metric": "eval_seconds_per_checkpoint_voc07_test_extrapolated",
        "value": round(per_example * VOC07_TEST_IMAGES, 1),
        "note": "%d images x %.2fs; full %d-example run_evaluation pass "
                "(predict+metrics+AP) took %.1fs"
                % (VOC07_TEST_IMAGES, per_example, args.examples, full_pass),
    }))
    print(json.dumps({
        "metric": "eval_device_forward_seconds_per_scale",
        "value": round(per_scale_device, 4),
        "largest_canvas": [int(short), int(long_)],
        "compute_bound_seconds_per_checkpoint": round(
            per_scale_device * len(min_dims) * VOC07_TEST_IMAGES, 1
        ),
        "note": "device-resident batch; the gap vs per_example is "
                "host pipeline + transfer (tunnel-bound in this sandbox)",
    }))


if __name__ == "__main__":
    main()
