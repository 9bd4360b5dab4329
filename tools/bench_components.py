"""Component-level TPU timing for the Cap2Det train step.

Times each stage of the flagship workload separately (two-run slope
method — see bench.py for why block_until_ready can't be trusted on the
axon tunnel) and prints one JSON line per component to stdout plus a
summary table to stderr. Used to decide where optimization effort goes;
results are recorded in BENCH_NOTES.md.

Usage:  python tools/bench_components.py [--steps N] [--components a,b,...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 2
CANVAS_HW = (1024, 1536)
NUM_PROPOSALS = 500
NUM_CLASSES = 80
OICR_ITERATIONS = 3
CROP = 14


from benchlib import slope_time as _shared_slope_time  # noqa: E402


def _slope_time(fn, args, n2, sync):
    """Seconds per call via two-run slope (tools/benchlib.py)."""
    return _shared_slope_time(fn, args, steps=n2, sync=sync)


def main():
    parser = argparse.ArgumentParser()
    global BATCH, NUM_CLASSES
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--components", default="")
    parser.add_argument("--proposals", type=int, default=NUM_PROPOSALS)
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--classes", type=int, default=NUM_CLASSES)
    parser.add_argument(
        "--full_freeze", action="store_true",
        help="Freeze the whole first stage (the voc07_inc2 regime: no "
             "Mixed_4e re-enable) — elides the ROI backward in train_step.",
    )
    args = parser.parse_args()
    BATCH = args.batch
    NUM_CLASSES = args.classes

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.models import registry, inception_v2, frcnn
    from cap2det_tpu.train import trainer as trainer_lib
    import cap2det_tpu.models  # noqa: F401
    import __graft_entry__ as graft
    import tempfile

    num_proposals = args.proposals
    n2 = args.steps
    backend = jax.default_backend()
    print("backend: %s" % backend, file=sys.stderr)

    from benchlib import sync_scalarize

    classes = ["class_%02d" % i for i in range(NUM_CLASSES)]
    label_file = synthetic.write_label_file(
        os.path.join(tempfile.mkdtemp(prefix="benchc_"), "labels.txt"), classes
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(graft._MODEL_PBTXT % label_file)["model"]
    )
    m = model_cfg.cap2det_model
    object.__setattr__(m, "oicr_iterations", OICR_ITERATIONS)
    object.__setattr__(m.frcnn_options, "initial_crop_size", CROP)
    import bench as bench_mod

    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(
            bench_mod._FULL_FREEZE_TRAIN_PBTXT if args.full_freeze
            else graft._TRAIN_PBTXT
        )
    ).train_config
    model = registry.build(model_cfg, is_training=True,
                           compute_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    state, tx, _, mask = trainer_lib.TrainState.create(model, train_config, rng)

    rs = np.random.RandomState(0)
    h, w = CANVAS_HW
    y0 = rs.uniform(0, 0.5, (BATCH, num_proposals))
    x0 = rs.uniform(0, 0.5, (BATCH, num_proposals))
    from cap2det_tpu.fields import InputFields

    # Through model.device_batch (f16 + host space-to-depth packing) so
    # every component — first_stage, features, train_step — times the
    # production feed path, same as bench.py and the trainer.
    host_batch = {
        InputFields.image: rs.uniform(
            0, 255, (BATCH, h, w, 3)
        ).astype(np.float32),
        InputFields.proposals: np.stack(
            [y0, x0, y0 + rs.uniform(0.1, 0.5, (BATCH, num_proposals)),
             x0 + rs.uniform(0.1, 0.5, (BATCH, num_proposals))], -1
        ).astype(np.float32),
        InputFields.num_proposals: np.full(
            (BATCH,), num_proposals, np.int32
        ),
        InputFields.pseudo_labels: (
            rs.rand(BATCH, NUM_CLASSES) < 0.05
        ).astype(np.float32),
    }
    batch = jax.device_put(model.device_batch(host_batch))
    step_rng = jax.random.PRNGKey(1)

    params = state["params"]
    fo = model_cfg.cap2det_model.frcnn_options

    # Precomputed intermediates for isolated stages.
    fh, fw = h // 16, w // 16
    feat = jax.device_put(
        rs.normal(0, 1, (BATCH, fh, fw, 576)).astype(jnp.bfloat16)
    )
    pooled_s = CROP // 2
    rois = jax.device_put(
        rs.normal(0, 1, (BATCH * num_proposals, pooled_s, pooled_s, 576))
        .astype(jnp.bfloat16)
    )
    prop_feats = jax.device_put(
        rs.normal(0, 1, (BATCH, num_proposals, 1024)).astype(np.float32)
    )

    results = {}

    def record(name, seconds, flops=None):
        results[name] = seconds
        entry = {"component": name, "ms": round(seconds * 1e3, 3)}
        if flops:
            entry["tflops_per_s"] = round(flops / seconds / 1e12, 2)
        print(json.dumps(entry), flush=True)

    want = set(args.components.split(",")) if args.components else None

    def enabled(name):
        return want is None or name in want

    # -- full train step ------------------------------------------------
    if enabled("train_step"):
        step_fn = jax.jit(
            trainer_lib.make_train_step(model, tx, train_config, mask)
        )
        def run_step(st, b, r):
            return step_fn(st, b, r)[1]
        record(
            "train_step",
            _slope_time(run_step, (state, batch, step_rng), n2,
                        sync_scalarize),
        )

    # -- first stage forward --------------------------------------------
    if enabled("first_stage"):
        first = jax.jit(
            lambda p, im: inception_v2.first_stage(
                p[frcnn.FIRST_SCOPE], inception_v2.preprocess(im)
            )
        )
        record(
            "first_stage_fwd",
            _slope_time(first, (params, batch["image"]), n2,
                        sync_scalarize),
        )

    # -- first stage fwd+bwd in the bench train regime (Mixed_4e trainable,
    #    everything below frozen): the cost the train step actually pays
    #    for the first stage, fwd + dW of Mixed_4e ----------------------
    if enabled("first_stage_fwdbwd_4e"):
        def fs_loss(p, im):
            def keep(path, leaf):
                return (
                    leaf
                    if "Mixed_4e" in "/".join(str(k) for k in path)
                    else jax.lax.stop_gradient(leaf)
                )
            p = jax.tree_util.tree_map_with_path(
                keep, p[frcnn.FIRST_SCOPE]
            )
            out = inception_v2.first_stage(p, inception_v2.preprocess(im))
            return jnp.sum(out.astype(jnp.float32))

        gfs = jax.jit(jax.grad(fs_loss))
        record(
            "first_stage_fwdbwd_4e",
            _slope_time(gfs, (params, batch["image"]), n2, sync_scalarize),
        )

    # -- optimizer update alone (tx.update + apply_updates on the real
    #    param/grad tree): the non-model part of the train step ---------
    if enabled("optimizer"):
        import optax

        grads0 = jax.tree.map(jnp.zeros_like, state["params"])

        def opt_only(st, g):
            updates, _ = tx.update(g, st["opt_state"], st["params"])
            return optax.apply_updates(st["params"], updates)

        gopt = jax.jit(opt_only)
        record(
            "optimizer",
            _slope_time(gopt, (state, grads0), n2, sync_scalarize),
        )

    # -- ROI crop+pool: pallas vs XLA ------------------------------------
    boxes = batch["proposals"]
    if enabled("roi_pallas") and backend == "tpu":
        from cap2det_tpu.kernels import roi_pool

        f = jax.jit(
            lambda ft, bx: roi_pool.roi_crop_maxpool(ft, bx, CROP, 2, 2)
        )
        record("roi_pallas_fwd",
               _slope_time(f, (feat, boxes), n2, sync_scalarize))

        # The loss must be NONLINEAR in the kernel output: with a linear
        # loss the cotangent is constant and XLA dead-code-eliminates the
        # forward custom call entirely (the custom-vjp residuals are
        # (features, boxes), not the output), so grad-of-sum silently
        # measures the BACKWARD ALONE — discovered via the r4 device
        # profile (BENCH_NOTES.md r4: in-situ fwd 4.5 + bwd 14.5 ms while
        # this bench reported "fwd+bwd 14.5").
        g = jax.jit(
            jax.grad(
                lambda ft, bx: jnp.sum(
                    roi_pool.roi_crop_maxpool(ft, bx, CROP, 2, 2)
                    .astype(jnp.float32) ** 2
                )
            )
        )
        record("roi_pallas_fwdbwd",
               _slope_time(g, (feat, boxes), n2, sync_scalarize))

    if enabled("roi_xla"):
        from cap2det_tpu.ops import roi as roi_ops

        f = jax.jit(
            lambda ft, bx: roi_ops.crop_resize_maxpool(ft, bx, CROP, 2, 2)
        )
        record("roi_xla_fwd",
               _slope_time(f, (feat, boxes), n2, sync_scalarize))
        g = jax.jit(
            jax.grad(
                lambda ft, bx: jnp.sum(
                    roi_ops.crop_resize_maxpool(ft, bx, CROP, 2, 2)
                    .astype(jnp.float32) ** 2
                )
            )
        )
        record("roi_xla_fwdbwd",
               _slope_time(g, (feat, boxes), n2, sync_scalarize))

    # -- second stage ----------------------------------------------------
    if enabled("second_stage"):
        second = jax.jit(
            lambda p, r: inception_v2.second_stage(
                p[frcnn.SECOND_SCOPE], r
            )
        )
        record(
            "second_stage_fwd",
            _slope_time(second, (params, rois), n2, sync_scalarize),
        )

        def second_loss(p, r):
            out = inception_v2.second_stage(p[frcnn.SECOND_SCOPE], r)
            return jnp.sum(out.astype(jnp.float32))

        gsecond = jax.jit(jax.grad(second_loss))
        record(
            "second_stage_fwdbwd",
            _slope_time(gsecond, (params, rois), n2, sync_scalarize),
        )

    # -- full feature extraction (first + roi + second) -------------------
    if enabled("features"):
        fx = jax.jit(
            lambda p, im, bx: frcnn.extract_features(
                p, im, bx, fo, is_training=False
            )
        )
        record(
            "features_fwd",
            _slope_time(fx, (params, batch["image"], boxes), n2,
                        sync_scalarize),
        )

    # -- heads + losses from proposal features ----------------------------
    if enabled("heads"):
        from cap2det_tpu.models import wsod
        from cap2det_tpu.ops import masked
        from cap2det_tpu.ops import losses as loss_ops

        def heads_loss(p, pf, labels, proposals, num_proposals):
            mask = masked.sequence_mask(
                num_proposals, maxlen=proposals.shape[1], dtype=jnp.float32
            )
            class_logits, proposal_scores, proba_r_given_c = wsod.midn_head(
                p["midn"], pf, mask
            )
            total = loss_ops.sigmoid_cross_entropy(labels, class_logits).mean()
            b, mp = mask.shape
            scores_0 = jnp.concatenate(
                [jnp.zeros((b, mp, 1), proba_r_given_c.dtype), proba_r_given_c],
                axis=-1,
            )
            for i in range(OICR_ITERATIONS):
                scores_1 = wsod.fc(p["oicr"]["iter%d" % (i + 1)], pf)
                total += 0.5 * wsod.oicr_loss(
                    labels, proposals, scores_0, scores_1, mask,
                    iou_threshold=0.6,
                )
                scores_0 = jax.nn.softmax(scores_1, axis=-1)
            return total

        gheads = jax.jit(jax.grad(heads_loss))
        record(
            "heads_fwdbwd",
            _slope_time(
                gheads,
                (params, prop_feats, batch["labels"], boxes,
                 batch["num_proposals"]),
                n2, sync_scalarize,
            ),
        )

    # -- heads sub-parts (inc2 attribution: 14.2 ms at P=2000 vs <1 GFLOP
    #    of math — which piece lowers badly?) -----------------------------
    if enabled("heads_parts"):
        from cap2det_tpu.models import wsod
        from cap2det_tpu.ops import masked
        from cap2det_tpu.ops import losses as loss_ops

        pmask = jax.device_put(
            np.ones((BATCH, num_proposals), np.float32)
        )
        scores_prev = jax.device_put(
            rs.rand(BATCH, num_proposals, 1 + NUM_CLASSES).astype(np.float32)
        )
        scores_next = jax.device_put(
            rs.normal(0, 1, (BATCH, num_proposals, 1 + NUM_CLASSES))
            .astype(np.float32)
        )

        # FC heads alone (5 matmuls [B,P,1024] x [1024,C]) fwd+bwd.
        def fc_loss(p, pf):
            total = jnp.sum(wsod.fc(p["midn"]["proba_r_given_c"], pf))
            total += jnp.sum(wsod.fc(p["midn"]["proba_c_given_r"], pf))
            for i in range(OICR_ITERATIONS):
                total += jnp.sum(wsod.fc(p["oicr"]["iter%d" % (i + 1)], pf))
            return total

        record(
            "heads_fc_fwdbwd",
            _slope_time(jax.jit(jax.grad(fc_loss, argnums=1)),
                        (params, prop_feats), n2, sync_scalarize),
        )

        # MIDN head (masked softmax over P + sum) fwd+bwd wrt features.
        def midn_loss(p, pf, labels):
            logits, _, _ = wsod.midn_head(p["midn"], pf, pmask)
            return loss_ops.sigmoid_cross_entropy(labels, logits).mean()

        record(
            "heads_midn_fwdbwd",
            _slope_time(jax.jit(jax.grad(midn_loss, argnums=1)),
                        (params, prop_feats, batch["labels"]),
                        n2, sync_scalarize),
        )

        # OICR target assignment alone (argmax/gather/IoU; no grads —
        # targets are stop-gradient).
        assign = jax.jit(
            lambda labels, bx, sp: wsod.oicr_target_assignment(
                labels, bx, sp, pmask, 0.6
            )
        )
        record(
            "heads_oicr_assign_fwd",
            _slope_time(assign, (batch["labels"], boxes, scores_prev),
                        n2, sync_scalarize),
        )

        # OICR CE given fixed targets, fwd+bwd wrt scores.
        def ce_loss(targets, sn):
            ce = loss_ops.softmax_cross_entropy(targets, sn)
            return jnp.mean(masked.masked_avg(ce, pmask, axis=1))

        targets = jax.device_put(np.asarray(
            assign(batch["labels"], boxes, scores_prev)
        ))
        record(
            "heads_oicr_ce_fwdbwd",
            _slope_time(jax.jit(jax.grad(ce_loss, argnums=1)),
                        (targets, scores_next), n2, sync_scalarize),
        )

    print(json.dumps({"summary": {k: round(v * 1e3, 3)
                                  for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
