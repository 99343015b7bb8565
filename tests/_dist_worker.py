"""Worker for the real 2-process distributed integration test
(tests/test_multiprocess_integration.py).

Usage: python _dist_worker.py <coordinator_port> <process_id> <cli args...>

Initializes jax.distributed against a localhost coordinator with 4 virtual
CPU devices per process (8 global), then runs the REAL CLI path — the
behavior claimed by the multi-host wiring
(reference: tools/dist_util.py:33-55) under actual cross-process
collectives instead of monkeypatches.
"""

import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    # XLA_FLAGS/JAX_PLATFORMS/VAW_PLATFORM must be set by the PARENT (the
    # axon sitecustomize partially imports jax at interpreter start, so
    # in-process env edits are too late); this process only pins the
    # in-process config and the CPU collectives backend.
    assert "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""), "driver must set XLA_FLAGS before spawn"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from vaw_tpu.parallel.distributed import setup_distributed

    assert setup_distributed(f"localhost:{port}", 2, pid)
    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    from vaw_tpu.cli.main import main as cli_main

    cli_main(sys.argv[3:])
    # final logdir (post-timestamping) for the driver
    print(f"WORKER_DONE pid={pid}", flush=True)


if __name__ == "__main__":
    main()
