"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The sandbox boots with an `axon` TPU PJRT plugin whose sitecustomize
forces ``jax_platforms="axon,cpu"`` via ``jax.config.update`` — plain
``JAX_PLATFORMS=cpu`` in the environment is overridden. Unit tests must
run on a local 8-device CPU mesh (fast, no tunnel round-trips), so we
set the XLA host-device-count flag before any backend initializes and
override the jax config back to cpu.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
