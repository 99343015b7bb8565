"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-world substitute for a fake NCCL backend (SURVEY.md section 4):
multi-chip sharding is validated on host-platform virtual devices.
Must run before jax initializes its backends.
"""

import os

# Force, don't setdefault: the driver environment pins JAX_PLATFORMS to the
# TPU tunnel, but unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
