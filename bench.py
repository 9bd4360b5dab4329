"""Benchmark: Cap2Det training step throughput (images/sec/chip).

Runs the flagship configuration at paper-scale shapes — COCO 80 classes,
batch 2, 1024x1536 canvas (the min-dimension-1000 bucket), 500 selective
search proposals, InceptionV2 backbone in bfloat16, MIDN + 3 OICR
iterations, Adagrad with the shipped gradient multipliers — and measures
steady-state jitted train-step throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (TF 1.x) publishes no throughput numbers
(SURVEY.md §6), so vs_baseline divides by a MEASURED floor — the
identical train step on this host's CPU backend in f32
(`python bench.py --cpu_baseline`); derivation in BASELINE.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured floor: this exact train step (f32, identical shapes) on the
# host CPU backend — `python bench.py --cpu_baseline` reproduces it AND
# refreshes BASELINE_CPU.json with this machine's number; the TPU run
# prefers that file so the ratio always compares against a floor measured
# on the same host. See BASELINE.md §throughput for the derivation. The
# reference publishes no throughput numbers (SURVEY §6).
BASELINE_MEASURED_CPU_IMAGES_PER_SEC = 0.0326  # measured 2026-08-16, host 'vm'
BASELINE_CPU_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json"
)


def _load_cpu_baseline():
    """Returns (images_per_sec, source_string) for the vs_baseline ratio."""
    try:
        with open(BASELINE_CPU_FILE) as fid:
            rec = json.load(fid)
        return float(rec["value"]), "BASELINE_CPU.json (host %s, %s)" % (
            rec.get("host", "?"), rec.get("date", "?")
        )
    except (OSError, ValueError, KeyError):
        return (
            BASELINE_MEASURED_CPU_IMAGES_PER_SEC,
            "built-in constant (host 'vm', 2026-08-16); run "
            "`python bench.py --cpu_baseline` to measure this machine",
        )

BATCH = 2
CANVAS_HW = (1024, 1536)
NUM_PROPOSALS = 500
NUM_CLASSES = 80
OICR_ITERATIONS = 3
WARMUP_STEPS = 3
MEASURE_STEPS = 16  # two-run slope: 5 + 16 measured steps

# --shape inc2: the regime of the reference's best published number
# (voc07_inc2.pbtxt, 50.7 mAP — BASELINE.md): batch 1, min-dim-1000
# canvas, 2000 selective-search proposals, 20 classes. Critically,
# voc07_inc2 freezes the ENTIRE first stage (no Mixed_4e re-enable,
# configs/voc07_inc2.pbtxt:91-98 — unlike the coco17 configs), which
# makes the ROI kernel's dfeat output dead: the trainer's leaf-level
# stop_gradient lets JAX partial-eval elide the whole ROI backward +
# first-stage backward cone (tests/test_frozen_backward.py pins this).
# full_freeze selects that regime; the bench shape keeps the coco17
# Mixed_4e-unfrozen multipliers (a live ROI backward).
SHAPES = {
    "bench": dict(batch=2, canvas_hw=(1024, 1536), num_proposals=500,
                  num_classes=80, full_freeze=False),
    "inc2": dict(batch=1, canvas_hw=(1024, 1536), num_proposals=2000,
                 num_classes=20, full_freeze=True),
}

# The voc07_inc2/voc07_groundtruth training regime: whole first stage
# frozen (mirrors configs/voc07_inc2.pbtxt train_config).
_FULL_FREEZE_TRAIN_PBTXT = """
train_config {
  max_steps: 100
  learning_rate: 0.01
  learning_rate_decay { decay_steps: 100000 decay_rate: 1.0 staircase: true }
  moving_average_decay: 0.0
  optimizer { adagrad {} }
  gradient_multiplier { scope: 'first_stage_feature_extraction' multiplier: 0.0 }
  gradient_multiplier { scope: 'second_stage_feature_extraction' multiplier: 1.0 }
}
"""


def run_e2e(args):
    """End-to-end throughput: host pipeline (decode/augment/canvas) +
    host->device transfer + jitted step, with the trainer's device-side
    double buffering. Also measures the host pipeline alone — the
    host-bound asymptote — so BENCH_NOTES can state which side limits.
    """
    import time

    import jax

    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import pipeline as pipeline_lib
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.train import trainer as trainer_lib
    import cap2det_tpu.models  # noqa: F401
    import tempfile

    import __graft_entry__ as graft

    work = tempfile.mkdtemp(prefix="bench_e2e_")
    classes = ["class_%02d" % i for i in range(NUM_CLASSES)]
    label_file = synthetic.write_label_file(
        os.path.join(work, "labels.txt"), classes
    )
    record = os.path.join(work, "train.record")
    # COCO-like source sizes; the reader upscales onto the min-dim canvas.
    synthetic.write_synthetic_dataset(
        record, num_examples=24, seed=0, classes=classes,
        image_hw=(480, 640), num_proposals=NUM_PROPOSALS,
    )

    reader_text = """
      cap2det_reader {
        input_pattern: "%s"
        is_training: true
        shuffle_buffer_size: 8
        batch_size: %d
        image_resizer {
          keep_aspect_ratio_resizer { min_dimension: %d }
        }
        preprocess_options { random_flip_left_right_prob: 0.5 }
        max_num_proposals: %d
        batch_resize_scale_value: 1.0
        map_num_parallel_calls: 8
      }
    """ % (record, BATCH, args.e2e_min_dim, NUM_PROPOSALS)
    config_text = (
        "train_reader { %s } model { %s } %s"
        % (
            reader_text,
            (graft._MODEL_PBTXT % label_file).split("model {", 1)[1].rsplit("}", 1)[0],
            graft._TRAIN_PBTXT,
        )
    )
    cfg = schema.Pipeline.from_dict(pbtxt.parse(config_text))
    m = cfg.model.cap2det_model
    object.__setattr__(m, "oicr_iterations", OICR_ITERATIONS)
    object.__setattr__(m.frcnn_options, "initial_crop_size", 14)
    object.__setattr__(cfg.train_config, "log_step_count_steps", 10 ** 9)

    # Host-only rate: drive the pipeline alone (same config/seed), in the
    # production training-feed layout (packed uint8, pack_s2d — what the
    # trainer actually consumes via Cap2DetModel.pipeline_kwargs).
    pipe = pipeline_lib.build_input_pipeline(
        cfg.train_reader, seed=1, pack_s2d=True
    )
    it = iter(pipe)
    for _ in range(2):  # warm the decode caches/threads
        next(it)
    n_host = 8
    t0 = time.time()
    for _ in range(n_host):
        next(it)
    host_rate = BATCH * n_host / (time.time() - t0)
    del it, pipe

    warm, measure = 4, args.measure_steps or 16
    times = {}

    def hook(step, state, logs):
        if step == warm or step == warm + measure:
            # Host materialization, not block_until_ready — the latter
            # returns early on the axon tunnel (tools/benchlib.py).
            float(logs["loss/total_loss"])
            times[step] = time.time()

    trainer_lib.train(
        cfg, model_dir=None, max_steps=warm + measure, seed=2, hooks=[hook]
    )
    e2e_rate = BATCH * measure / (times[warm + measure] - times[warm])
    print(
        json.dumps(
            {
                "metric": "cap2det_e2e_train_images_per_sec",
                "value": round(e2e_rate, 4),
                "unit": "images/sec",
                "min_dimension": args.e2e_min_dim,
                "host_pipeline_images_per_sec": round(host_rate, 4),
                "host_workers": max(
                    1,
                    min(
                        cfg.train_reader.cap2det_reader
                        .map_num_parallel_calls,
                        os.cpu_count() or 1,
                    ),
                ),
                "note": "e2e = host pipeline + H2D (double-buffered) + "
                        "jitted step; host_pipeline is the host-bound "
                        "asymptote on this machine",
            }
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--cpu_baseline", action="store_true",
        help="Measure the identical train step on the host CPU backend in "
             "f32 (the documented baseline floor) instead of the TPU run.",
    )
    parser.add_argument(
        "--e2e", action="store_true",
        help="Measure END-TO-END training throughput (host pipeline over "
             "real TFRecords + transfer + step) instead of the "
             "device-resident step.",
    )
    parser.add_argument(
        "--e2e_min_dim", type=int, default=1000,
        help="keep-aspect min_dimension for the --e2e run (use a small "
             "value to demonstrate the compute-bound regime where e2e ~= "
             "step rate).",
    )
    parser.add_argument(
        "--shape", choices=sorted(SHAPES), default="bench",
        help="'bench' (batch 2 / P=500 / 80 classes, the driver shape) or "
             "'inc2' (batch 1 / P=2000 / 20 classes — the voc07_inc2 "
             "regime of the reference's best published mAP).",
    )
    parser.add_argument("--measure_steps", type=int, default=None)
    parser.add_argument(
        "--batch", type=int, default=None,
        help="Override the shape's batch size (batch-scaling sweeps; "
             "per-image semantics are unchanged — losses are batch "
             "means).",
    )
    args = parser.parse_args()

    if args.e2e:
        run_e2e(args)
        return

    shape = SHAPES[args.shape]
    batch_size = args.batch or shape["batch"]
    canvas_hw = shape["canvas_hw"]
    num_proposals = shape["num_proposals"]
    num_classes = shape["num_classes"]

    import jax

    if args.cpu_baseline:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.models import registry
    from cap2det_tpu.train import trainer as trainer_lib
    import cap2det_tpu.models  # noqa: F401
    import tempfile

    classes = ["class_%02d" % i for i in range(num_classes)]
    label_file = synthetic.write_label_file(
        os.path.join(tempfile.mkdtemp(prefix="bench_"), "labels.txt"), classes
    )

    import __graft_entry__ as graft

    model_cfg = schema.Model.from_dict(
        pbtxt.parse(graft._MODEL_PBTXT % label_file)["model"]
    )
    # Paper-scale head config.
    m = model_cfg.cap2det_model
    object.__setattr__(m, "oicr_iterations", OICR_ITERATIONS)
    object.__setattr__(m.frcnn_options, "initial_crop_size", 14)
    train_pbtxt = (
        _FULL_FREEZE_TRAIN_PBTXT if shape["full_freeze"]
        else graft._TRAIN_PBTXT
    )
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(train_pbtxt)
    ).train_config

    compute_dtype = jnp.float32 if args.cpu_baseline else jnp.bfloat16
    model = registry.build(model_cfg, is_training=True,
                           compute_dtype=compute_dtype)

    rng = jax.random.PRNGKey(0)
    state, tx, _, mask = trainer_lib.TrainState.create(model, train_config, rng)
    train_step = jax.jit(
        trainer_lib.make_train_step(model, tx, train_config, mask), donate_argnums=0
    )

    rs = np.random.RandomState(0)
    h, w = canvas_hw
    y0 = rs.uniform(0, 0.5, (batch_size, num_proposals))
    x0 = rs.uniform(0, 0.5, (batch_size, num_proposals))
    from cap2det_tpu.fields import InputFields

    # Through model.device_batch — the production feed path (f16 pixels,
    # host-side space-to-depth packing), so the bench measures exactly
    # what the trainer ships.
    host_batch = {
        InputFields.image: rs.uniform(
            0, 255, (batch_size, h, w, 3)
        ).astype(np.float32),
        InputFields.proposals: np.stack(
            [y0, x0, y0 + rs.uniform(0.1, 0.5, (batch_size, num_proposals)),
             x0 + rs.uniform(0.1, 0.5, (batch_size, num_proposals))], -1
        ).astype(np.float32),
        InputFields.num_proposals: np.full(
            (batch_size,), num_proposals, np.int32
        ),
        InputFields.pseudo_labels: (
            rs.rand(batch_size, num_classes) < 0.05
        ).astype(np.float32),
    }
    batch = jax.device_put(model.device_batch(host_batch))
    step_rng = jax.random.PRNGKey(1)

    # Timing methodology (shared with the component benches): see
    # tools/benchlib.py — host-materialized sync + two-run slope, the
    # only trustworthy recipe on the axon-tunneled TPU.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from benchlib import slope_time

    for _ in range(WARMUP_STEPS):
        state, logs = train_step(state, batch, step_rng)
    warm_loss = float(logs["loss/total_loss"])  # forces compile + execution
    assert np.isfinite(warm_loss), warm_loss

    # MFU arithmetic from the compiled program's own cost model (flops
    # counts each MAC as 2; Pallas custom calls are NOT counted, so this
    # alone is a lower bound on real FLOPs). The Pallas ROI kernel's
    # analytic counts (kernels/roi_pool.py estimate_flops) are added on
    # top for the true-MFU number: fwd always; bwd only when it is live
    # (full_freeze elides it — tests/test_frozen_backward.py).
    step_flops = None
    pallas_flops = 0.0
    try:
        cost = train_step.lower(state, batch, step_rng).compile().cost_analysis()
        if cost and cost.get("flops"):
            step_flops = float(cost["flops"])
    except Exception:
        pass
    if jax.default_backend() == "tpu":
        from cap2det_tpu.kernels import roi_pool
        from cap2det_tpu.models import inception_v2

        roi = roi_pool.estimate_flops(
            batch_size, num_proposals, h // 16, w // 16,
            inception_v2.FIRST_STAGE_DEPTH, m.frcnn_options.initial_crop_size,
            m.frcnn_options.maxpool_kernel_size,
        )
        pallas_flops = roi["fwd"] + (
            0.0 if shape["full_freeze"] else roi["bwd"]
        )

    state_box = {"state": state}

    def one_step():
        state_box["state"], logs = train_step(
            state_box["state"], batch, step_rng
        )
        return logs

    measure_steps = args.measure_steps or (
        2 if args.cpu_baseline else MEASURE_STEPS
    )
    per_step = slope_time(
        one_step, (), steps=measure_steps,
        sync=lambda logs: float(logs["loss/total_loss"]),
    )
    images_per_sec = batch_size / per_step
    if args.cpu_baseline:
        import datetime
        import socket

        record = {
            "metric": "cap2det_train_images_per_sec_cpu_f32",
            "value": round(images_per_sec, 4),
            "unit": "images/sec",
            "shape": args.shape,
            "host": socket.gethostname(),
            "date": datetime.date.today().isoformat(),
            "note": "measured baseline floor; see BASELINE.md",
        }
        if args.shape == "bench":  # the floor the driver ratio uses
            with open(BASELINE_CPU_FILE, "w") as fid:
                json.dump(record, fid)
        print(json.dumps(record))
        return
    out = {
        "metric": (
            "cap2det_train_images_per_sec_per_chip"
            if args.shape == "bench"
            else "cap2det_inc2_train_images_per_sec_per_chip"
        ),
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "shape": args.shape,
        "batch": batch_size,
        "step_ms": round(per_step * 1e3, 2),
    }
    if step_flops:
        V5E_BF16_PEAK = 197e12
        out["tflops_per_step"] = round(step_flops / 1e12, 3)
        out["mfu_lower_bound"] = round(
            step_flops / per_step / V5E_BF16_PEAK, 4
        )
        if pallas_flops:
            total = step_flops + pallas_flops
            out["tflops_per_step_incl_pallas"] = round(total / 1e12, 3)
            out["mfu"] = round(total / per_step / V5E_BF16_PEAK, 4)
    if args.shape == "bench":  # the CPU floor was measured at this shape
        baseline_value, baseline_source = _load_cpu_baseline()
        out["vs_baseline"] = round(images_per_sec / baseline_value, 2)
        out["baseline_source"] = baseline_source
    print(json.dumps(out))


if __name__ == "__main__":
    main()
