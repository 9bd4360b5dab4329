"""Training loop: jitted SPMD train step + checkpointing + metrics.

Replaces the reference Estimator machinery (train/trainer.py:177-235)
with an explicit functional loop:

  pipeline config -> model (registry) -> input pipeline -> jit train_step
  over a 1-D device mesh (batch sharded, params replicated) -> orbax
  checkpoints at the configured cadence.

The optimizer chain reproduces LR decay, per-scope gradient multipliers /
freezing, per-variable clipping, and parameter moving averages (see
train/optimizers.py).
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cap2det_tpu.config import schema
from cap2det_tpu.data import pipeline as pipeline_lib
from cap2det_tpu.models import registry
from cap2det_tpu.parallel import mesh as mesh_lib
from cap2det_tpu.train import checkpoint as ckpt_lib
from cap2det_tpu.train import metrics as metrics_lib
from cap2det_tpu.train import optimizers

log = logging.getLogger("cap2det.trainer")


class TrainState:
    """Plain pytree container: {params, opt_state, ema, step}."""

    @staticmethod
    def create(model, train_config, rng):
        params = model.init_params(rng)
        tx, mask, schedule = optimizers.build_optimizer(
            train_config,
            params,
            non_trainable_paths=model.non_trainable_paths,
            non_trainable_substrings=getattr(
                model, "non_trainable_substrings", ()
            ),
        )
        opt_state = tx.init(params)
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }
        if _ema_decay(train_config) is not None:
            state["ema"] = optimizers.ema_init(params)
        return state, tx, schedule, mask


def _ema_decay(train_config):
    """Effective moving-average decay, or None when disabled.

    The reference wraps the optimizer in MovingAverageOptimizer whenever
    the field is SET (reference train/trainer.py:98-100) — and every
    shipped config sets it to 0.0, where the TF shadow update
    `shadow -= (1-decay)*(shadow-var)` makes the shadow equal the
    variable after every step. Maintaining a second param tree that is
    bit-identical to the live one is pure overhead (a full param-tree
    copy per step), so decay == 0.0 is elided here: eval_params serves
    the live params, which is exactly what the swapping saver would
    have checkpointed.
    """
    if not train_config.has_field("moving_average_decay"):
        return None
    decay = train_config.moving_average_decay
    return decay if decay > 0.0 else None


def make_train_step(model, tx, train_config, trainable_mask=None,
                    pmean_axis=None):
    """Builds the jittable train step fn(state, batch, rng) -> (state, logs).

    Frozen leaves (trainable_mask False) are stop_gradient'ed inside the
    loss so XLA dead-code-eliminates their whole backward cone — the
    reference likewise only differentiates variables_to_train
    (train/trainer.py:141-146); without this, the frozen first-stage
    backbone's backward pass would be computed and thrown away.

    With `pmean_axis` set, the step body is written for shard_map over a
    data-parallel mesh axis: per-shard gradients (and logged losses) are
    psum-averaged across the axis before the optimizer update, the SPMD
    replacement for the reference's parameter-server aggregation.
    """
    ema_decay = _ema_decay(train_config)

    def train_step(state, batch, rng):
        params = state["params"]
        # Per-step randomness derives from the step counter INSIDE the
        # jitted program: the caller passes one constant base rng for the
        # whole run. A host-side jax.random.split per step is a device
        # dispatch — a full round trip per step on remote links — and
        # this form is also reproducible across checkpoint restarts
        # (the split chain was not).
        rng = jax.random.fold_in(rng, state["step"])
        if pmean_axis is not None:
            # Decorrelate per-shard randomness (dropout etc.): every shard
            # receives the same replicated step rng, so fold the data-axis
            # index in before any sampling — the SPMD analogue of the
            # reference's independent per-worker randomness.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmean_axis))

        def loss_fn(p):
            if trainable_mask is not None:
                p = jax.tree.map(
                    lambda leaf, t: leaf if t else jax.lax.stop_gradient(leaf),
                    p,
                    trainable_mask,
                )
            total, loss_dict = model.loss(p, batch, rng=rng, is_training=True)
            return total, loss_dict

        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            total = jax.lax.pmean(total, pmean_axis)
            loss_dict = jax.lax.pmean(loss_dict, pmean_axis)
        updates, opt_state = tx.update(grads, state["opt_state"], params)
        params = optax.apply_updates(params, updates)

        new_state = dict(state)
        new_state["params"] = params
        new_state["opt_state"] = opt_state
        new_state["step"] = state["step"] + 1
        if ema_decay is not None:
            new_state["ema"] = optimizers.ema_update(
                state["ema"], params, ema_decay
            )
        logs = {"loss/total_loss": total}
        logs.update({"loss/" + k: v for k, v in loss_dict.items()})
        return new_state, logs

    return train_step


def eval_params(state):
    """Parameters to evaluate/export: the moving average when enabled
    (MovingAverageOptimizer swapping-saver semantics)."""
    return state.get("ema", state["params"])


def _device_prefetch(host_batches, place, depth=2):
    """Keeps `depth` placed batches in flight: the NEXT batch's host->
    device transfer (jax.device_put is asynchronous) is issued while the
    current step executes, overlapping H2D with compute. The reference
    only prefetched on the host side (readers/cap2det_reader.py:266);
    without this the transfer serializes ahead of every step."""
    import collections

    buf = collections.deque()
    it = iter(host_batches)
    try:
        while len(buf) < depth:
            buf.append(place(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(place(next(it)))
        except StopIteration:
            pass
        yield out


def train(
    pipeline_config: schema.Pipeline,
    model_dir=None,
    max_steps=None,
    log_every=None,
    seed=0,
    use_mesh=True,
    hooks=(),
    pretrained_checkpoint=None,
    profile_steps=None,
    profiler_port=None,
):
    """Runs training per the pipeline config. Returns the final state.

    Args:
      hooks: callables hook(step, state, logs) invoked after each step.
      pretrained_checkpoint: optional converted ImageNet backbone (orbax
        dir from tools/convert_tf_checkpoint.py); overlaid on fresh inits
        only — resuming from a checkpoint wins (reference warm-start
        semantics, models/utils.py:181-186).
      profile_steps: optional (start, stop) step pair; captures a
        jax.profiler trace to <model_dir>/profile between them (the
        reference had no profiler at all, SURVEY.md §5).
      profiler_port: optional port for jax.profiler.start_server (live
        TensorBoard profiling endpoint).
    """
    model_dir = model_dir or pipeline_config.model_dir
    train_config = pipeline_config.train_config
    max_steps = max_steps or train_config.max_steps
    log_every = log_every or train_config.log_step_count_steps

    model = registry.build(pipeline_config.model, is_training=True)
    reader = pipeline_config.train_reader
    pipe_seed = seed
    if jax.process_count() > 1:
        # Multi-host: every process must feed a DISTINCT local slice of
        # the global batch, or make_array_from_process_local_data silently
        # assembles duplicated data. shard_indicator partitions the
        # example stream deterministically; without it, fall back to
        # decorrelating the shuffle/augment randomness per process and
        # say so loudly (sampling-with-replacement semantics across
        # hosts — statistically fine for shuffled training, but set
        # shard_indicator for a true partition).
        shard_distinct = False
        if reader.cap2det_reader.shard_indicator:
            # The common launch reuses ONE pipeline.pbtxt on every host,
            # so a static shard_indicator means every process filters to
            # the SAME shard — verify actual distinctness by comparing
            # the shard numerators across processes before trusting it
            # as a partition.
            from jax.experimental import multihost_utils

            numer = int(
                reader.cap2det_reader.shard_indicator.split("/")[0]
            )
            numers = np.asarray(multihost_utils.process_allgather(
                np.array([numer], np.int32)
            )).reshape(-1)
            shard_distinct = len(set(numers.tolist())) == len(numers)
            if shard_distinct:
                log.info(
                    "multi-host: per-process data from shard_indicator %r",
                    reader.cap2det_reader.shard_indicator,
                )
            else:
                log.warning(
                    "shard_indicator %r numerators are not distinct across "
                    "processes (%s) — not a data partition; falling "
                    "back to per-process seed decorrelation",
                    reader.cap2det_reader.shard_indicator, numers.tolist(),
                )
        if not shard_distinct:
            pipe_seed = seed + 7919 * jax.process_index()
            log.warning(
                "multi-host training without train_reader.shard_indicator: "
                "decorrelating hosts by per-process pipeline seed %d; set "
                "shard_indicator: '%d/%d' for a disjoint data partition",
                pipe_seed, jax.process_index(), jax.process_count(),
            )
    pipe = pipeline_lib.build_input_pipeline(reader, seed=pipe_seed,
                                             **model.pipeline_kwargs())

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    state, tx, schedule, trainable_mask = TrainState.create(
        model, train_config, init_rng
    )

    if pretrained_checkpoint and hasattr(model, "load_pretrained"):
        converted = ckpt_lib.restore_params(pretrained_checkpoint)
        state["params"] = model.load_pretrained(state["params"], converted)
        if "ema" in state:
            state["ema"] = optimizers.ema_init(state["params"])
        log.info("loaded pretrained backbone from %s", pretrained_checkpoint)

    manager = None
    writer = None
    if model_dir:
        os.makedirs(model_dir, exist_ok=True)
        manager = ckpt_lib.CheckpointManager(
            model_dir, keep_max=train_config.keep_checkpoint_max
        )
        restored = manager.restore(jax.device_get(state))
        if restored is not None:
            state = restored
            log.info("restored checkpoint at step %s", int(state["step"]))
        writer = metrics_lib.MetricsWriter(model_dir)

    mesh = None
    batch_size = reader.cap2det_reader.batch_size
    n_devices = len(jax.devices())
    if use_mesh and n_devices > 1 and jax.process_count() > 1:
        # Multi-host: the reader's batch_size is PER PROCESS; every host
        # feeds its local slice of the global batch (shard_batch uses
        # make_array_from_process_local_data). Distinct data per host is
        # enforced above (shard_indicator or per-process pipeline seed).
        local = jax.local_device_count()
        if batch_size % local != 0:
            raise ValueError(
                "multi-host training needs per-process batch_size (%d) "
                "divisible by the local device count (%d)"
                % (batch_size, local)
            )
        mesh = mesh_lib.create_mesh()
        state = jax.device_put(state, mesh_lib.replicated(mesh))
    elif use_mesh and n_devices > 1:
        usable = mesh_lib.usable_device_count(batch_size)
        if usable > 1:
            if usable < n_devices:
                log.warning(
                    "batch_size %d not divisible by %d devices; using the "
                    "largest usable sub-mesh of %d devices",
                    batch_size, n_devices, usable,
                )
            mesh = mesh_lib.create_mesh(jax.devices()[:usable])
            # Replicate state across the mesh so every device participates
            # in the SPMD program (mixed single-device/sharded placements
            # deadlock the collective).
            state = jax.device_put(state, mesh_lib.replicated(mesh))
        else:
            log.warning(
                "batch_size %d shares no divisor with %d devices; training "
                "single-device — raise batch_size for data parallelism",
                batch_size, n_devices,
            )

    if mesh is not None:
        # Explicit SPMD: shard_map over the data axis; the step body
        # psum-averages gradients (this also keeps Pallas kernels valid
        # under multi-chip — each shard runs the kernel on its slice).
        from jax.sharding import PartitionSpec as P

        step_fn = make_train_step(
            model, tx, train_config, trainable_mask,
            pmean_axis=mesh_lib.DATA_AXIS,
        )
        train_step = jax.jit(
            jax.shard_map(
                step_fn,
                mesh=mesh,
                in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
                out_specs=(P(), P()),
                check_vma=False,
            ),
            donate_argnums=0,
        )
    else:
        train_step = jax.jit(
            make_train_step(model, tx, train_config, trainable_mask),
            donate_argnums=0,
        )

    step = int(state["step"])
    t_start = time.time()
    t_window, window_steps, window_examples = time.time(), 0, 0
    logs = {}
    profiler_dir = os.path.join(model_dir or ".", "profile")
    if profiler_port:
        jax.profiler.start_server(profiler_port)
        log.info("profiler server on port %d", profiler_port)
    profiling = False

    def _place(host_batch):
        batch = model.device_batch(host_batch)
        if mesh is not None:
            return mesh_lib.shard_batch(mesh, batch)
        return jax.device_put(batch)

    # One device placement for the whole run: the per-step rng is derived
    # from the step counter inside the jitted step (make_train_step).
    rng, base_rng = jax.random.split(rng)
    if mesh is not None:
        base_rng = jax.device_put(base_rng, mesh_lib.replicated(mesh))

    for batch in _device_prefetch(pipe, _place, depth=2):
        if step >= max_steps:
            break
        if profile_steps is not None:
            if not profiling and step == profile_steps[0]:
                jax.profiler.start_trace(profiler_dir)
                profiling = True
            elif profiling and step >= profile_steps[1]:
                jax.block_until_ready(logs)
                jax.profiler.stop_trace()
                profiling = False
                log.info("profiler trace written to %s", profiler_dir)
        state, logs = train_step(state, batch, base_rng)
        step += 1
        window_steps += 1
        window_examples += batch_size

        if step % log_every == 0 or step >= max_steps:
            jax.block_until_ready(logs)
            dt = time.time() - t_window
            rate = window_steps / max(dt, 1e-9)
            examples_rate = window_examples / max(dt, 1e-9)
            lr = float(schedule(step))
            log.info(
                "step %d loss %.5f (%.2f steps/s, %.2f ex/s, lr %.5f)",
                step,
                float(logs["loss/total_loss"]),
                rate,
                examples_rate,
                lr,
            )
            if writer is not None:
                scalars = {k: float(v) for k, v in logs.items()}
                scalars["loss/learning_rate"] = lr
                scalars["global_step/sec"] = rate
                scalars["examples/sec"] = examples_rate
                writer.write(step, scalars)
            t_window, window_steps, window_examples = time.time(), 0, 0

        if manager is not None and step % train_config.save_checkpoints_steps == 0:
            manager.save(step, jax.device_get(state))

        for hook in hooks:
            hook(step, state, logs)

    if profiling:
        jax.block_until_ready(logs)
        jax.profiler.stop_trace()
    if manager is not None:
        manager.save(step, jax.device_get(state))
        manager.close()
    if writer is not None:
        writer.close()
    log.info("training finished at step %d in %.1fs", step, time.time() - t_start)
    return state


def create_train_and_evaluate(pipeline_config, model_dir=None, **kwargs):
    """Name-compatible entry point (reference trainer.create_train_and_evaluate)."""
    return train(pipeline_config, model_dir=model_dir, **kwargs)
