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
MEASURE_STEPS = 10


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--cpu_baseline", action="store_true",
        help="Measure the identical train step on the host CPU backend in "
             "f32 (the documented baseline floor) instead of the TPU run.",
    )
    parser.add_argument("--measure_steps", type=int, default=None)
    args = parser.parse_args()

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

    classes = ["class_%02d" % i for i in range(NUM_CLASSES)]
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
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(graft._TRAIN_PBTXT)
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
    h, w = CANVAS_HW
    y0 = rs.uniform(0, 0.5, (BATCH, NUM_PROPOSALS))
    x0 = rs.uniform(0, 0.5, (BATCH, NUM_PROPOSALS))
    batch = {
        "image": rs.uniform(0, 255, (BATCH, h, w, 3)).astype(np.float32),
        "proposals": np.stack(
            [y0, x0, y0 + rs.uniform(0.1, 0.5, (BATCH, NUM_PROPOSALS)),
             x0 + rs.uniform(0.1, 0.5, (BATCH, NUM_PROPOSALS))], -1
        ).astype(np.float32),
        "num_proposals": np.full((BATCH,), NUM_PROPOSALS, np.int32),
        "labels": (rs.rand(BATCH, NUM_CLASSES) < 0.05).astype(np.float32),
    }
    batch = jax.device_put(batch)
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
    images_per_sec = BATCH / per_step
    if args.cpu_baseline:
        import datetime
        import socket

        record = {
            "metric": "cap2det_train_images_per_sec_cpu_f32",
            "value": round(images_per_sec, 4),
            "unit": "images/sec",
            "host": socket.gethostname(),
            "date": datetime.date.today().isoformat(),
            "note": "measured baseline floor; see BASELINE.md",
        }
        with open(BASELINE_CPU_FILE, "w") as fid:
            json.dump(record, fid)
        print(json.dumps(record))
        return
    baseline_value, baseline_source = _load_cpu_baseline()
    print(
        json.dumps(
            {
                "metric": "cap2det_train_images_per_sec_per_chip",
                "value": round(images_per_sec, 4),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / baseline_value, 2),
                "baseline_source": baseline_source,
            }
        )
    )


if __name__ == "__main__":
    main()
