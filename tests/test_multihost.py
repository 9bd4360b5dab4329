"""Real multi-process jax.distributed smoke test.

Two local processes form a cluster through parallel.distributed
.maybe_initialize (coordinator over localhost — the DCN control plane),
build the global 1-D mesh, and run a psum across BOTH processes'
devices. This is the SPMD replacement for the reference's localhost
TF_CONFIG parameter-server cluster (train_wsod.sh:23-92), actually
exercised rather than assumed.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)

from cap2det_tpu.parallel import distributed, mesh as mesh_lib

ok = distributed.maybe_initialize(
    coordinator_address=%(coord)r,
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert ok
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 procs x 2 cpu devs

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

mesh = mesh_lib.create_mesh()  # global 1-D data mesh over all 4 devices


def summed(x):
    return jax.lax.psum(x, mesh_lib.DATA_AXIS)


fn = jax.jit(
    jax.shard_map(
        summed, mesh=mesh, in_specs=P(mesh_lib.DATA_AXIS), out_specs=P(),
        check_vma=False,
    )
)
import numpy as np

local = jax.process_index()
# Global array [4] sharded one element per device; psum = 0+1+2+3 = 6.
from jax.sharding import NamedSharding

global_x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(mesh_lib.DATA_AXIS)),
    np.asarray([2.0 * local, 2.0 * local + 1.0], np.float32),
    (4,),
)
out = fn(global_x)
total = float(np.asarray(jax.device_get(out))[0] if np.ndim(out) else out)
assert total == 6.0, total

# The real trainer step across both processes: psum-averaged grads.
import optax
from cap2det_tpu.config import schema
from cap2det_tpu.train import trainer as trainer_lib


class _Probe:
    def loss(self, params, batch, rng, is_training):
        per = jnp.mean(batch["x"]) * params["w"]
        return per, {"per": per}


tx = optax.scale(-1.0)
step_fn = trainer_lib.make_train_step(
    _Probe(), tx, schema.TrainConfig(), trainable_mask=None,
    pmean_axis=mesh_lib.DATA_AXIS,
)
sharded_step = jax.jit(
    jax.shard_map(
        step_fn, mesh=mesh,
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
state = jax.device_put(state, NamedSharding(mesh, P()))
batch = {
    "x": jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(mesh_lib.DATA_AXIS)),
        np.asarray([2.0 * local, 2.0 * local + 1.0], np.float32)[:, None],
        (4, 1),
    )
}
rng0 = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
new_state, logs = sharded_step(state, batch, rng0)
# grad = pmean over shards of mean(x) = mean([0,1,2,3]) = 1.5; update -1.5.
w = float(np.asarray(jax.device_get(new_state["params"]["w"])))
assert abs(w + 1.5) < 1e-6, w

# The trainer's own placement helper: each process hands shard_batch its
# HOST-LOCAL batch and the result must be the distinct global batch (not
# the local batch replicated) — the mesh_lib.shard_batch multi-process
# branch via make_array_from_process_local_data.
state2 = {
    "params": {"w": jnp.zeros(())},
    "opt_state": tx.init({"w": jnp.zeros(())}),
    "step": jnp.zeros((), jnp.int32),
}
state2 = jax.device_put(state2, NamedSharding(mesh, P()))
local_batch = {
    "x": np.asarray([2.0 * local, 2.0 * local + 1.0], np.float32)[:, None]
}
batch2 = mesh_lib.shard_batch(mesh, local_batch)
assert batch2["x"].shape == (4, 1), batch2["x"].shape  # global, not local
new_state2, _ = sharded_step(state2, batch2, rng0)
w2 = float(np.asarray(jax.device_get(new_state2["params"]["w"])))
assert abs(w2 + 1.5) < 1e-6, w2
print("proc %%d ok total=%%.1f w=%%.2f w2=%%.2f" %% (local, total, w, w2),
      flush=True)
"""


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    script = _WORKER % {"repo": repo, "coord": coord}
    path = str(tmp_path / "worker.py")
    with open(path, "w") as fid:
        fid.write(script)

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, path, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "proc %d failed:\n%s" % (i, out[-3000:])
        assert "ok total=6.0 w=-1.50 w2=-1.50" in out, out[-2000:]
