"""Host->device prefetch: keep the TPUs fed.

Double-buffered device prefetch replaces the reference's pinned-memory
DataLoader workers (reference: main.py:171-177): batches are device_put with
the 'data'-axis sharding while the previous step computes, overlapping the
host->HBM copy with TPU compute.
"""

from __future__ import annotations

import collections
import threading
import queue as queue_mod
from typing import Iterator

import jax

from ..parallel.mesh import batch_sharding

__all__ = ["prefetch_to_device"]


def prefetch_to_device(iterator: Iterator, mesh, size: int = 2,
                       background: bool = True):
    """Yield device-resident, 'data'-sharded batches, `size` steps ahead.
    With `background=True`, host-side batch assembly (disk reads, crops)
    runs in a separate thread so it overlaps both compute and transfer."""
    sharding = batch_sharding(mesh)

    if jax.process_count() > 1:
        # Multi-host: each process holds 1/P of the global batch; assemble
        # the global 'data'-sharded array from the local slices
        # (device_put of a host-local full array is single-process only).
        def put(batch):
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, x
                ),
                batch,
            )
    else:
        def put(batch):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )

    if background:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
        sentinel = object()
        err: list = []

        def worker():
            # An exception here (HDF5 read error, corrupt image, OOM in
            # device_put) must surface in the CONSUMER: enqueueing only the
            # sentinel would look like clean end-of-data, silently stopping
            # training mid-run (and hanging peers at the next collective on
            # multi-host).
            try:
                for batch in iterator:
                    q.put(put(batch))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise RuntimeError(
                        "data prefetch worker failed") from err[0]
                return
            yield item
    else:
        buf = collections.deque()
        for batch in iterator:
            buf.append(put(batch))
            if len(buf) >= size:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
