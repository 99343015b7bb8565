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


def _num_slices(devices) -> int:
    """Distinct ICI domains (slices). Single-slice and CPU devices have no
    slice_index attribute -> 1."""
    return len({getattr(d, "slice_index", 0) or 0 for d in devices})


def _topology_grid(shape, devices):
    """Topology-aware device assignment: the minor (model/stage) axis lands
    on ICI neighbors; on a multi-slice pod the major (data) axis groups
    slices contiguously so its inter-slice legs — and only those — ride the
    DCN (the scaling-book mesh recipe). Falls back to None when the device
    set has no usable topology metadata (e.g. explicit subsets)."""
    from jax.experimental import mesh_utils

    n_slices = _num_slices(devices)
    major, minor = shape
    try:
        if n_slices > 1:
            if major % n_slices != 0:
                return None  # data axis can't split evenly across slices
            return mesh_utils.create_hybrid_device_mesh(
                (major // n_slices, minor), (n_slices, 1), devices)
        return mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:  # noqa: BLE001 — any failure means "use device order"
        return None


def make_mesh(data_axis: int = -1, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh. data_axis == -1 uses all remaining
    devices on the data axis. On multi-host, call jax.distributed.initialize()
    first; jax.devices() then spans the full pod (all slices).

    With the default device set, assignment is topology-aware
    (mesh_utils.create_device_mesh / create_hybrid_device_mesh): TP
    collectives stay on ICI neighbors and only the data axis' inter-slice
    hops touch the DCN. An explicit `devices` sequence keeps the caller's
    order (tests and subset meshes rely on it)."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1:
        assert n % model_axis == 0, (n, model_axis)
        data_axis = n // model_axis
    assert data_axis * model_axis <= n
    want = data_axis * model_axis
    if not explicit and want == n:
        grid = _topology_grid((data_axis, model_axis), devices)
        if grid is not None:
            return Mesh(grid, ("data", "model"))
    grid = np.asarray(devices[:want]).reshape(data_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def make_pp_mesh(pp_stages: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'stage') mesh for dp+pp (parallel/dit_pipeline.py). The
    stage axis rides the fastest-varying device dim so stage hops are
    ICI neighbors."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % pp_stages == 0, (n, pp_stages)
    shape = (n // pp_stages, pp_stages)
    if not explicit and _num_slices(devices) == 1:
        # topology-aware neighbor assignment for the stage hops; multi-slice
        # pods keep device order (stages must never straddle the DCN — the
        # order-based reshape keeps each data-row's full stage chain inside
        # one slice whenever pp_stages divides the per-slice device count)
        grid = _topology_grid(shape, devices)
        if grid is not None:
            return Mesh(grid, ("data", "stage"))
    grid = np.asarray(devices).reshape(shape)
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
