"""Shared timing helpers for the TPU benches.

On the axon-tunneled TPU, ``block_until_ready()`` returns before remote
execution finishes; only a host materialization truly synchronizes (and
the first one includes the remote compile). All benches therefore
(a) force a scalar materialization to sync, and (b) measure two runs of
different step counts and use the slope, which cancels the constant
dispatch+transfer overhead. Keep this logic in ONE place — bench.py,
tools/bench_components.py and tools/bench_backbone_parts.py all use it.
"""

from __future__ import annotations

import time


def sync_scalarize(tree):
    """Forces execution by materializing a scalar from the first leaf."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def slope_time(fn, args=(), steps=8, sync=sync_scalarize):
    """Seconds per call of fn(*args) via the two-run slope method."""
    out = fn(*args)
    sync(out)  # compile + one execution

    def run(n):
        o = None
        t0 = time.time()
        for _ in range(n):
            o = fn(*args)
        sync(o)
        return time.time() - t0

    n1, n2 = max(steps // 3, 1), steps
    t1 = run(n1)
    t2 = run(n2)
    per = (t2 - t1) / (n2 - n1) if n2 > n1 else t2 / n2
    if per <= 0:  # overhead-dominated; fall back to the larger run
        per = t2 / n2
    return per
