"""Device-mesh construction and data shardings.

TPU-native replacement for the reference's NCCL process-group setup
(reference: tools/dist_util.py:33-102): a single SPMD process drives all
chips through a `jax.sharding.Mesh`. The reference's per-step
`dist.barrier()` (main.py:316), EMA broadcast (tools/sampler.py:92-94) and
gradient all-reduce (DDP, main.py:340-348) all disappear — gradient
reduction is inserted by XLA from shardings and rides the ICI.

Axes:
  data  — batch sharding (the reference's only strategy, DDP)
  model — tensor parallelism for transformer blocks (extension; the
          reference has none, SURVEY.md section 2.8)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "local_device_count"]


def local_device_count() -> int:
    """Devices attached to THIS process (on a pod, jax.devices() is the
    global count after jax.distributed.initialize — not what the name
    promises)."""
    return jax.local_device_count()


def make_mesh(data_axis: int = -1, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. data_axis == -1 uses all remaining
    devices on the data axis. On multi-host, call jax.distributed.initialize()
    first; jax.devices() then spans the full slice."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1:
        assert n % model_axis == 0, (n, model_axis)
        data_axis = n // model_axis
    assert data_axis * model_axis <= n
    grid = np.asarray(devices[: data_axis * model_axis]).reshape(
        data_axis, model_axis
    )
    return Mesh(grid, ("data", "model"))


def make_pp_mesh(pp_stages: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'stage') mesh for dp+pp (parallel/dit_pipeline.py). The
    stage axis rides the fastest-varying device dim so stage hops are
    ICI neighbors."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % pp_stages == 0, (n, pp_stages)
    grid = np.asarray(devices).reshape(n // pp_stages, pp_stages)
    return Mesh(grid, ("data", "stage"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'
    (replaces DistributedSampler, reference main.py:166-180)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
