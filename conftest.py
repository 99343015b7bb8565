"""Root conftest: force tests onto the virtual 8-device CPU mesh before any
plugin initializes a JAX backend (the driver env pins JAX_PLATFORMS to the
TPU tunnel; unit tests must not claim the chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent compilation cache: roughly half the suite wall time on
    # this box is XLA compiles of unchanged test programs.
    from vaw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass
