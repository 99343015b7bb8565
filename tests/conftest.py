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
# XLA:CPU's default f32 conv/matmul uses a reduced-precision algorithm
# (~bf16 error, measured 4e-2 vs 7e-7 on a 2x2 conv); pin true f32 so
# golden/parity tests measure algorithmic parity, not backend defaults.
jax.config.update("jax_default_matmul_precision", "highest")
