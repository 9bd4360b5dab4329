"""Device mesh + sharding helpers.

The reference's async parameter-server data parallelism
(train_wsod.sh:23-92, TF_CONFIG gRPC cluster) is deliberately replaced by
synchronous SPMD data parallelism: a 1-D mesh over chips, batch sharded on
the 'data' axis, parameters replicated, gradients all-reduced over ICI by
XLA collectives. See SURVEY.md §5.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def create_mesh(devices=None, axis_name=DATA_AXIS):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh):
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Places a pytree of host arrays with batch-axis sharding.

    Single-process: ``device_put`` with the global sharding. Multi-process:
    each process passes its HOST-LOCAL batch, which becomes this process's
    slice of the global batch (global batch = per-process batch x
    process_count) via ``make_array_from_process_local_data`` —
    ``device_put`` would wrongly treat every local array as the whole
    global batch and silently train on duplicated data.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def usable_device_count(batch_size, devices=None):
    """Largest divisor of batch_size that is <= available device count."""
    n = len(devices if devices is not None else jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return max(n, 1)
