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
