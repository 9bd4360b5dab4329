"""Multi-host initialization.

Single-program SPMD across hosts: ``jax.distributed.initialize`` wires the
DCN control plane, after which ``jax.devices()`` spans every host's chips
and the 1-D data mesh (parallel/mesh.py) covers the full fleet — gradient
all-reduce rides ICI within a slice and DCN across slices, all inserted by
XLA. This replaces the reference's TF_CONFIG parameter-server cluster
(train_wsod.sh:23-92) with a synchronous design; see SURVEY.md §5.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("cap2det.distributed")


def maybe_initialize(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initializes jax.distributed when multi-host settings are present.

    Settings come from explicit arguments or the standard environment
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, also set by most TPU launchers). No-op for
    single-host runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    # jax only reads JAX_COORDINATOR_ADDRESS itself; NUM_PROCESSES /
    # PROCESS_ID must be forwarded explicitly or generic (non-TPU-pod)
    # launchers fail with "Number of processes must be defined".
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return True
