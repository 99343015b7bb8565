"""Multi-host process setup and host-side collection.

TPU-native replacement of the reference's NCCL process-group module
(reference: tools/dist_util.py:20-102):

  dist.init_process_group("nccl", "env://")  -> jax.distributed.initialize()
  torchrun --nproc_per_node                  -> one process per host; the
                                                mesh spans every chip
  is_main_process (dist_util.py:20-27)       -> jax.process_index() == 0
  dist_barrier (dist_util.py:29-31)          -> sync_global_devices (only
                                                for host-side IO ordering;
                                                SPMD needs no per-step
                                                barrier)
  all_gather of samples (sampler.py:232-247) -> process_allgather
  broadcast of EMA params (sampler.py:92-94) -> unnecessary: replicated
                                                state is already consistent
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["setup_distributed", "is_main_process", "barrier",
           "process_allgather", "cleanup_distributed"]

_INITIALIZED = False


def setup_distributed(coordinator_address: Optional[str] = None,
                      num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host JAX runtime. No-op (returns False) in
    single-process runs — unlike NCCL, single-host multi-chip needs no
    process group at all."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    if coordinator_address is None and num_processes is None:
        # Auto-detection path (TPU pods set the env for us).
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
            return True
        except Exception as e:  # noqa: BLE001 — single-process fallback
            # Only a clean "not in a multi-process environment" should
            # degrade silently. A real pod whose coordinator connection
            # failed must NOT proceed as N independent single-process runs
            # (each would consume the full dataset and write its own
            # logdir) — surface the swallowed error loudly.
            import os
            import sys

            pod_env = any(os.environ.get(k) for k in (
                "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"))
            if pod_env:
                raise RuntimeError(
                    "jax.distributed.initialize() failed although a "
                    "coordinator address is configured — refusing to "
                    "silently run single-process on a pod") from e
            print(f"[distributed] single-process fallback ({e})",
                  file=sys.stderr)
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
    )
    _INITIALIZED = True
    return True


def is_main_process() -> bool:
    """Host-side IO gating (reference: tools/dist_util.py:20-27)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync for host-side IO ordering only
    (reference: tools/dist_util.py:29-31). SPMD compute needs none."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_allgather(x):
    """Gather host-local arrays across processes
    (replaces dist.all_gather sample collection,
    reference: tools/sampler.py:232-247)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x)
    return x


def cleanup_distributed():
    """(reference: tools/dist_util.py cleanup)"""
    global _INITIALIZED
    if _INITIALIZED:
        jax.distributed.shutdown()
        _INITIALIZED = False
