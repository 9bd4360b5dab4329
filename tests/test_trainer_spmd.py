"""SPMD train-step semantics on the virtual CPU mesh.

Covers the shard_map data-parallel path of train/trainer.py: psum-averaged
gradients and per-shard decorrelated randomness (the SPMD analogue of the
reference PS workers' independent randomness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from cap2det_tpu.config import schema
from cap2det_tpu.parallel import mesh as mesh_lib
from cap2det_tpu.train import trainer as trainer_lib


class _RngProbeModel:
    """Loss whose gradient IS the rng draw: d/dw [w * u(rng)] = u(rng)."""

    def loss(self, params, batch, rng, is_training):
        u = jax.random.uniform(rng, ())
        total = params["w"] * u + 0.0 * jnp.sum(batch["x"])
        return total, {"u": u}


def _run_step(n_shards, lr=1.0):
    devices = jax.devices()[:n_shards]
    mesh = mesh_lib.create_mesh(devices)
    tx = optax.scale(-lr)  # update = -lr * grad
    step_fn = trainer_lib.make_train_step(
        _RngProbeModel(), tx, schema.TrainConfig(),
        trainable_mask=None, pmean_axis=mesh_lib.DATA_AXIS,
    )
    sharded = jax.jit(
        jax.shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    state = {
        "params": {"w": jnp.zeros(())},
        "opt_state": tx.init({"w": jnp.zeros(())}),
        "step": jnp.zeros((), jnp.int32),
    }
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    batch = {"x": np.ones((2 * n_shards, 3), np.float32)}
    batch = mesh_lib.shard_batch(mesh, batch)
    rng = jax.device_put(jax.random.PRNGKey(7), mesh_lib.replicated(mesh))
    new_state, logs = sharded(state, batch, rng)
    return new_state, logs


def test_per_shard_rng_is_decorrelated_and_deterministic():
    base = jax.random.PRNGKey(7)
    # The step derives its rng as fold_in(base, step) INSIDE the program
    # (restart-reproducible; no host dispatch per step), then folds the
    # shard index in on the mesh path.
    step0 = jax.random.fold_in(base, 0)
    per_shard = [
        float(jax.random.uniform(jax.random.fold_in(step0, i), ()))
        for i in range(4)
    ]
    # Shards must draw DIFFERENT values.
    assert len(set(np.round(per_shard, 6))) == 4

    new_state, logs = _run_step(4)
    # grad = pmean of per-shard uniform draws; update = -grad.
    got = -float(new_state["params"]["w"])
    assert np.isclose(got, np.mean(per_shard), atol=1e-6), (got, per_shard)
    # The logged (pmean'd) aux matches too.
    assert np.isclose(float(logs["loss/u"]), np.mean(per_shard), atol=1e-6)

    # Not equal to what correlated shards would produce.
    correlated = float(jax.random.uniform(base, ()))
    assert not np.isclose(got, correlated, atol=1e-6)


def test_single_device_path_unchanged():
    tx = optax.scale(-1.0)
    step_fn = trainer_lib.make_train_step(
        _RngProbeModel(), tx, schema.TrainConfig(), trainable_mask=None
    )
    state = {
        "params": {"w": jnp.zeros(())},
        "opt_state": tx.init({"w": jnp.zeros(())}),
        "step": jnp.zeros((), jnp.int32),
    }
    batch = {"x": np.ones((2, 3), np.float32)}
    rng = jax.random.PRNGKey(7)
    new_state, _ = jax.jit(step_fn)(state, batch, rng)
    # Single-device: rng = fold_in(base, step) only (no shard fold).
    expect = float(jax.random.uniform(jax.random.fold_in(rng, 0), ()))
    assert np.isclose(-float(new_state["params"]["w"]), expect, atol=1e-6)


def _tiny_cap2det_model(tmp_path, dropout_keep_prob=1.0):
    """A small but REAL Cap2DetModel (InceptionV2 backbone, MIDN + OICR)."""
    import jax.numpy as jnp

    from cap2det_tpu.config import pbtxt
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.models import registry
    import cap2det_tpu.models  # noqa: F401

    label_file = synthetic.write_label_file(
        str(tmp_path / "labels.txt"), ["person", "dog", "car"]
    )
    text = """
    model {
      [Cap2DetModel.ext] {
        midn_loss_weight: 1.0
        oicr_loss_weight: 0.5
        frcnn_options {
          feature_extractor { type: 'faster_rcnn_inception_v2' }
          initial_crop_size: 6
          maxpool_kernel_size: 2
          maxpool_stride: 2
          dropout_keep_prob: %f
          dropout_on_feature_map: false
        }
        fc_hyperparams {
          op: FC
          regularizer { l2_regularizer { weight: 0.000001 } }
          initializer { truncated_normal_initializer { stddev: 0.01 } }
        }
        oicr_iterations: 2
        oicr_iou_threshold: 0.6
        midn_post_processor {
          score_thresh: 0.00001 iou_thresh: 0.4
          max_size_per_class: 10 max_total_size: 20
        }
        oicr_post_processor {
          score_thresh: 0.00001 iou_thresh: 0.3
          max_size_per_class: 10 max_total_size: 20
        }
        label_extractor { groundtruth_extractor { label_file: '%s' } }
      }
    }
    """ % (dropout_keep_prob, label_file)
    cfg = schema.Model.from_dict(pbtxt.parse(text)["model"])
    # f32 compute: the parity assertion is exact-math, not bf16.
    return registry.build(cfg, is_training=True, compute_dtype=jnp.float32)


def _cap2det_global_batch(n_images, num_proposals=8, hw=(64, 96), seed=0):
    rs = np.random.RandomState(seed)
    h, w = hw
    y0 = rs.uniform(0, 0.5, (n_images, num_proposals))
    x0 = rs.uniform(0, 0.5, (n_images, num_proposals))
    return {
        "image": rs.uniform(0, 255, (n_images, h, w, 3)).astype(np.float32),
        "proposals": np.stack(
            [y0, x0,
             y0 + rs.uniform(0.1, 0.5, (n_images, num_proposals)),
             x0 + rs.uniform(0.1, 0.5, (n_images, num_proposals))],
            -1,
        ).astype(np.float32),
        "num_proposals": np.full((n_images,), num_proposals, np.int32),
        "labels": (rs.rand(n_images, 3) < 0.4).astype(np.float32),
    }


def _tree_max_abs_diff(a_tree, b_tree):
    """(max-abs elementwise difference, leaf count) over two trees."""
    a = jax.tree_util.tree_leaves(jax.device_get(a_tree))
    b = jax.tree_util.tree_leaves(jax.device_get(b_tree))
    assert len(a) == len(b)
    worst = 0.0
    for x, y in zip(a, b):
        worst = max(
            worst,
            float(
                np.max(
                    np.abs(
                        np.asarray(x, np.float64) - np.asarray(y, np.float64)
                    )
                )
            ) if np.size(x) else 0.0,
        )
    return worst, len(a)


def test_real_model_spmd_parity(tmp_path):
    """The property that makes data parallelism CORRECT: an 8-device
    shard_map step on the real Cap2DetModel produces the same params and
    optimizer state as a single-device step on the identical global
    batch (the reference SyncReplicasOptimizer aggregation contract,
    train/trainer.py:90-94). A pmean placed after any non-linear
    reduction fails this.

    The assertion is single-step by design: the aggregation contract is
    a one-step property, and iterating it only feeds conv-reduction
    float noise (~1e-6) into the chaotic random-init loss landscape
    (measured amplification: 4.5e-6 -> 1.5e-3 max-abs over 3 steps),
    which says nothing about pmean placement. The measured one-step
    separation is >20x on params and >1e4x on the adagrad accumulators
    (good 4.5e-6 / 2.6-abs vs misplaced-pmean 1.7e-3 / 2.9e5), so the
    thresholds below have wide margins BOTH ways — and the misplaced
    variant is asserted to trip them."""
    import optax

    from cap2det_tpu.config import pbtxt
    from cap2det_tpu.train import trainer as trainer_lib

    model = _tiny_cap2det_model(tmp_path)
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(
            """
            train_config {
              learning_rate: 0.001
              learning_rate_decay {
                decay_steps: 10 decay_rate: 0.5 staircase: true
              }
              optimizer { adagrad {} }
              max_steps: 10
              moving_average_decay: 0.0
            }
            """
        )
    ).train_config

    n_dev = 8
    batch = _cap2det_global_batch(n_dev, seed=0)
    rng = jax.random.PRNGKey(3)
    base_rng = jax.random.PRNGKey(11)

    # -- single-device reference over the full global batch ------------
    state, tx, _, mask = trainer_lib.TrainState.create(model, train_config, rng)
    single_step = jax.jit(
        trainer_lib.make_train_step(model, tx, train_config, mask)
    )
    ref_state, ref_logs = single_step(state, batch, base_rng)
    assert np.isfinite(float(ref_logs["loss/total_loss"]))

    # -- 8-device shard_map on the identical global batch --------------
    mesh = mesh_lib.create_mesh(jax.devices()[:n_dev])
    sharded_step = jax.jit(
        jax.shard_map(
            trainer_lib.make_train_step(
                model, tx, train_config, mask,
                pmean_axis=mesh_lib.DATA_AXIS,
            ),
            mesh=mesh,
            in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    spmd_rng = jax.device_put(base_rng, mesh_lib.replicated(mesh))
    spmd_state, spmd_logs = sharded_step(
        jax.device_put(state, mesh_lib.replicated(mesh)),
        mesh_lib.shard_batch(mesh, batch),
        spmd_rng,
    )

    PARAM_TOL = 1e-4     # measured: good 4.5e-6, misplaced pmean 1.7e-3
    # Adagrad accumulators hold sum(grad^2) with grads up to ~6e2 at
    # random init, so compare them on a relative scale.
    ACC_REL_TOL = 1e-3   # measured: good ~1e-5, misplaced pmean ~0.7

    d_params, n_leaves = _tree_max_abs_diff(
        ref_state["params"], spmd_state["params"]
    )
    assert n_leaves > 50  # the real model, not a probe
    assert d_params < PARAM_TOL, d_params

    ref_acc = jax.tree_util.tree_leaves(jax.device_get(ref_state["opt_state"]))
    spmd_acc = jax.tree_util.tree_leaves(jax.device_get(spmd_state["opt_state"]))
    for x, y in zip(ref_acc, spmd_acc):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        if not np.size(x):
            continue
        rel = np.linalg.norm(x - y) / (np.linalg.norm(x) + 1e-12)
        assert rel < ACC_REL_TOL, rel

    np.testing.assert_allclose(
        float(spmd_logs["loss/total_loss"]),
        float(ref_logs["loss/total_loss"]),
        rtol=1e-5,
    )

    # -- teeth: a pmean misplaced AFTER the non-linear adagrad update
    # must trip the SAME thresholds. -----------------------------------
    def bad_step(st, b, r):
        params = st["params"]

        def loss_fn(p):
            return model.loss(p, b, rng=r, is_training=True)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, st["opt_state"], params)
        # WRONG: aggregate after the per-shard non-linear update.
        updates = jax.lax.pmean(updates, mesh_lib.DATA_AXIS)
        opt_state = jax.lax.pmean(opt_state, mesh_lib.DATA_AXIS)
        new_state = dict(st)
        new_state["params"] = optax.apply_updates(params, updates)
        new_state["opt_state"] = opt_state
        new_state["step"] = st["step"] + 1
        return new_state, {"loss/total_loss": total}

    bad = jax.jit(
        jax.shard_map(
            bad_step, mesh=mesh,
            in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
            out_specs=(P(), P()), check_vma=False,
        )
    )
    bad_state, _ = bad(
        jax.device_put(state, mesh_lib.replicated(mesh)),
        mesh_lib.shard_batch(mesh, batch),
        spmd_rng,
    )
    d_bad, _ = _tree_max_abs_diff(ref_state["params"], bad_state["params"])
    bad_acc = jax.tree_util.tree_leaves(jax.device_get(bad_state["opt_state"]))
    acc_rel_bad = max(
        np.linalg.norm(np.asarray(x, np.float64) - np.asarray(y, np.float64))
        / (np.linalg.norm(np.asarray(x, np.float64)) + 1e-12)
        for x, y in zip(ref_acc, bad_acc)
        if np.size(x)
    )
    assert d_bad > PARAM_TOL or acc_rel_bad > ACC_REL_TOL, (
        "misplaced pmean went undetected — the parity test has no teeth",
        d_bad, acc_rel_bad,
    )


def test_device_prefetch_orders_and_bounds():
    """_device_prefetch yields every batch in order and keeps at most
    `depth` placed batches ahead of the consumer (transfer overlap
    without unbounded lookahead)."""
    placed = []

    def place(x):
        placed.append(x)
        return x * 10

    out = list(trainer_lib._device_prefetch(range(5), place, depth=2))
    assert out == [0, 10, 20, 30, 40]
    assert placed == [0, 1, 2, 3, 4]

    # Laziness: after pulling one item, at most depth+1 have been placed.
    placed.clear()
    gen = trainer_lib._device_prefetch(range(100), place, depth=2)
    next(gen)
    assert len(placed) <= 3

    # Shorter than depth still yields everything.
    assert list(trainer_lib._device_prefetch([7], place, depth=4)) == [70]
    assert list(trainer_lib._device_prefetch([], place, depth=2)) == []
