"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

Multi-chip sharding logic is exercised without TPU hardware by forcing the
host platform to expose 8 virtual devices (SURVEY.md section 4: host-simulated
device meshes). Environment variables must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on host
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by the environment's sitecustomize (axon TPU
# registration), in which case the env var above is too late — force the
# platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
