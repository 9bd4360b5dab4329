"""Same-process step-level A/B over an environment knob.

The CAP2DET_* routing knobs are read at TRACE time, so two variants of
the train step can be built in one process by flipping the env var
between `jax.jit` traces. Each variant is slope-timed in alternating
rounds so tunnel drift cannot masquerade as a win (the only measurement
protocol BENCH_NOTES.md r4 items 15/19 found trustworthy).

Usage:
  python tools/bench_knob_ab.py --knob CAP2DET_AVG_BWD \
      --values slices,fused [--shape bench] [--rounds 2] [--steps 8]

`--values` entries may be `unset` (knob removed) or `K=V,K2=V2` compound
settings separated by `+` (e.g. `CAP2DET_POOL_FWD=rw+CAP2DET_AVG_BWD=rw`).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_step(shape_name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.fields import InputFields
    from cap2det_tpu.models import registry
    from cap2det_tpu.train import optimizers, trainer as trainer_lib
    import cap2det_tpu.models  # noqa: F401
    import __graft_entry__ as graft

    shape = bench.SHAPES[shape_name]
    batch, (h, w) = shape["batch"], shape["canvas_hw"]
    num_proposals, num_classes = shape["num_proposals"], shape["num_classes"]
    classes = ["class_%02d" % i for i in range(num_classes)]
    label_file = synthetic.write_label_file(
        os.path.join(tempfile.mkdtemp(prefix="knobab_"), "labels.txt"),
        classes,
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(graft._MODEL_PBTXT % label_file)["model"]
    )
    m = model_cfg.cap2det_model
    object.__setattr__(m, "oicr_iterations", bench.OICR_ITERATIONS)
    object.__setattr__(m.frcnn_options, "initial_crop_size", 14)
    train_pbtxt = (
        bench._FULL_FREEZE_TRAIN_PBTXT if shape["full_freeze"]
        else graft._TRAIN_PBTXT
    )
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(train_pbtxt)
    ).train_config
    model = registry.build(model_cfg, is_training=True,
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    tx, mask, _ = optimizers.build_optimizer(
        train_config,
        params,
        non_trainable_paths=model.non_trainable_paths,
        non_trainable_substrings=getattr(
            model, "non_trainable_substrings", ()
        ),
    )
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if trainer_lib._ema_decay(train_config) is not None:
        state["ema"] = optimizers.ema_init(params)

    rs = np.random.RandomState(0)
    y0 = rs.uniform(0, 0.5, (batch, num_proposals))
    x0 = rs.uniform(0, 0.5, (batch, num_proposals))
    host_batch = {
        InputFields.image: rs.uniform(0, 255, (batch, h, w, 3)).astype(
            np.float32
        ),
        InputFields.proposals: np.stack(
            [y0, x0,
             y0 + rs.uniform(0.1, 0.5, (batch, num_proposals)),
             x0 + rs.uniform(0.1, 0.5, (batch, num_proposals))], -1
        ).astype(np.float32),
        InputFields.num_proposals: np.full((batch,), num_proposals,
                                           np.int32),
        InputFields.pseudo_labels: (
            rs.rand(batch, num_classes) < 0.05
        ).astype(np.float32),
    }
    batch_dev = jax.device_put(model.device_batch(host_batch))

    def make(trace_env):
        saved = {}
        for k, v in trace_env.items():
            saved[k] = os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        try:
            step = jax.jit(
                trainer_lib.make_train_step(model, tx, train_config, mask)
            )
            # Force trace+compile under this env (knobs are trace-time).
            logs = step(state, batch_dev, rng)[1]
            import jax.numpy as jnp
            float(next(iter(logs.values())).astype(jnp.float32))
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
        return step

    return make, state, batch_dev, rng


def parse_value(knob, value):
    env = {}
    for part in value.split("+"):
        if part == "unset":
            env[knob] = None
        elif "=" in part:
            k, v = part.split("=", 1)
            env[k] = v
        else:
            env[knob] = part
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", required=True)
    ap.add_argument("--values", required=True)
    ap.add_argument("--shape", default="bench")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from benchlib import slope_time, sync_scalarize

    make, state, batch_dev, rng = build_step(args.shape)
    variants = []
    for value in args.values.split(","):
        env = parse_value(args.knob, value)
        print("tracing %s ..." % value, file=sys.stderr)
        variants.append((value, make(env)))

    results = {v: [] for v, _ in variants}
    for r in range(args.rounds):
        for value, step in variants:
            ms = slope_time(
                lambda s, b, k: step(s, b, k)[1],
                (state, batch_dev, rng),
                steps=args.steps,
                sync=sync_scalarize,
            ) * 1e3
            results[value].append(round(ms, 2))
            print("round %d %s=%s: %.2f ms" % (r, args.knob, value, ms),
                  file=sys.stderr)
    print(json.dumps({"shape": args.shape, "knob": args.knob,
                      "step_ms": results}))


if __name__ == "__main__":
    main()
