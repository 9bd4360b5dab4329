"""Same-process A/B: fused flat optimizer vs per-leaf multi_transform.

Measures (a) the optimizer update alone and (b) the full train step
under each transformation, in one process so tunnel drift can't skew
the comparison. Results recorded in BENCH_NOTES.md.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 2
CANVAS_HW = (1024, 1536)
NUM_PROPOSALS = 500
NUM_CLASSES = 80


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.models import registry
    from cap2det_tpu.train import trainer as trainer_lib
    from cap2det_tpu.train import optimizers
    import cap2det_tpu.models  # noqa: F401
    import __graft_entry__ as graft
    from benchlib import slope_time, sync_scalarize
    from cap2det_tpu.fields import InputFields

    n2 = int(os.environ.get("AB_STEPS", "8"))
    classes = ["class_%02d" % i for i in range(NUM_CLASSES)]
    label_file = synthetic.write_label_file(
        os.path.join(tempfile.mkdtemp(prefix="optab_"), "labels.txt"), classes
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(graft._MODEL_PBTXT % label_file)["model"]
    )
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(graft._TRAIN_PBTXT)
    ).train_config
    model = registry.build(model_cfg, is_training=True,
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)

    rs = np.random.RandomState(0)
    h, w = CANVAS_HW
    y0 = rs.uniform(0, 0.5, (BATCH, NUM_PROPOSALS))
    x0 = rs.uniform(0, 0.5, (BATCH, NUM_PROPOSALS))
    host_batch = {
        InputFields.image: rs.uniform(0, 255, (BATCH, h, w, 3)).astype(
            np.float32
        ),
        InputFields.proposals: np.stack(
            [y0, x0,
             y0 + rs.uniform(0.1, 0.5, (BATCH, NUM_PROPOSALS)),
             x0 + rs.uniform(0.1, 0.5, (BATCH, NUM_PROPOSALS))], -1
        ).astype(np.float32),
        InputFields.num_proposals: np.full((BATCH,), NUM_PROPOSALS, np.int32),
        InputFields.pseudo_labels: (
            rs.rand(BATCH, NUM_CLASSES) < 0.05
        ).astype(np.float32),
    }
    batch = jax.device_put(model.device_batch(host_batch))

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["fused", "unfused", "both"],
                    default="both")
    cli = ap.parse_args()
    variants = (
        (("fused", True), ("unfused", False))
        if cli.variant == "both"
        else ((cli.variant, cli.variant == "fused"),)
    )

    results = {}
    for name, fused in variants:
        tx, mask, _ = optimizers.build_optimizer(
            train_config,
            params,
            non_trainable_paths=model.non_trainable_paths,
            non_trainable_substrings=getattr(
                model, "non_trainable_substrings", ()
            ),
            fused=fused,
        )
        state = {
            "params": params,
            "opt_state": tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        if trainer_lib._ema_decay(train_config) is not None:
            state["ema"] = optimizers.ema_init(params)

        # Undonated jit: the timed call must be repeatable on the same
        # state buffers (slope timing), so no donation here; the real
        # trainer donates, which only removes copies both variants share.
        step_fn2 = jax.jit(
            trainer_lib.make_train_step(model, tx, train_config, mask)
        )
        results["step_" + name] = slope_time(
            lambda s, b, r: step_fn2(s, b, r)[1],
            (state, batch, rng),
            steps=n2,
            sync=sync_scalarize,
        )

        grads0 = jax.tree.map(jnp.zeros_like, params)

        def opt_only(st, g, _tx=tx):
            updates, _ = _tx.update(g, st["opt_state"], st["params"])
            return optax.apply_updates(st["params"], updates)

        results["opt_" + name] = slope_time(
            jax.jit(opt_only), (state, grads0), steps=n2, sync=sync_scalarize
        )
        print(
            "%s: opt %.3f ms, step %.3f ms"
            % (
                name,
                results["opt_" + name] * 1e3,
                results["step_" + name] * 1e3,
            ),
            file=sys.stderr,
        )

    import json

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
