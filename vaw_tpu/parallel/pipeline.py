"""GPipe-style pipeline parallelism over a 'stage' mesh axis.

The reference has no pipeline parallelism (SURVEY.md section 2.8: PP "No");
this is the TPU-native extension: identical transformer blocks are stacked
on a leading axis, sharded over a `stage` mesh axis, and microbatches flow
stage-to-stage via `jax.lax.ppermute` over ICI inside one `shard_map`
program. The schedule is the classic GPipe fill-drain loop — M microbatches
over S stages take M + S - 1 ticks; each tick every stage runs its local
blocks on its in-flight microbatch, then activations shift one hop right.

Reverse-mode differentiates through the `lax.scan` over ticks, so the same
program trains (the backward pass naturally runs the drain in reverse via
the transposed ppermute).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["pipeline", "stack_stage_params"]


def stack_stage_params(params_per_block, num_stages: int):
    """[L x pytree] -> pytree with leading [S, L/S] axes (blocks grouped by
    stage). Input: list of per-block param pytrees."""
    n = len(params_per_block)
    assert n % num_stages == 0, (n, num_stages)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params_per_block
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape(num_stages, n // num_stages, *x.shape[1:]),
        stacked,
    )


def pipeline(block_fn: Callable, mesh: Mesh, num_microbatches: int,
             stage_axis: str = "stage", batch_axis: str = None):
    """Build a pipelined apply over `mesh`'s `stage_axis`.

    block_fn(block_params, x, aux) -> x applies ONE block; each stage scans
    it over its local [L/S, ...] block stack. The returned function takes
    (stage_params [S, L/S, ...], x [B, ...], aux [B, ...]-pytree) and
    returns y [B, ...]. aux (e.g. the adaLN conditioning vector) rides along
    each microbatch, delayed per stage to stay aligned with its activations.

    `batch_axis` composes dp+pp on a 2D mesh: activations shard their batch
    dim over it while block params shard over `stage_axis` (each data row
    runs its own fill-drain schedule on its batch shard).
    """
    num_stages = mesh.shape[stage_axis]

    def stage_fn(local_params, x, aux):
        # local_params: [L/S, ...]; scan the blocks sequentially.
        def body(h, block_params):
            return block_fn(block_params, h, aux), None

        out, _ = jax.lax.scan(body, x, local_params)
        return out

    def pipelined(stage_params, x, aux):
        m = num_microbatches
        batch = x.shape[0]
        if batch_axis:
            assert batch % (m * mesh.shape[batch_axis]) == 0, (batch, m)
        else:
            assert batch % m == 0, (batch, m)

        def shmap_body(local_params, x, aux):
            local_params = jax.tree_util.tree_map(
                lambda p: p[0], local_params
            )  # drop the sharded stage dim (size 1 locally)
            s = jax.lax.axis_index(stage_axis)
            mb = x.shape[0] // m  # local per-microbatch size
            mbs = x.reshape(m, mb, *x.shape[1:])
            aux_mb = jax.tree_util.tree_map(
                lambda a: a.reshape(m, mb, *a.shape[1:]), aux
            )
            buf = jnp.zeros_like(mbs[0])
            outputs = jnp.zeros_like(mbs)
            # The carry becomes device-varying after the first tick (ppermute
            # + per-stage writes); mark the initial zeros accordingly for the
            # shard_map VMA type system.
            try:
                buf = jax.lax.pcast(buf, (stage_axis,), to="varying")
                outputs = jax.lax.pcast(outputs, (stage_axis,), to="varying")
            except (AttributeError, TypeError):
                pass  # older jax without VMA tracking

            def tick(carry, t):
                buf, outputs = carry
                inject = mbs[jnp.clip(t, 0, m - 1)]
                cur = jnp.where(s == 0, inject, buf)
                # each stage is processing microbatch (t - s); its aux:
                a_idx = jnp.clip(t - s, 0, m - 1)
                aux_t = jax.tree_util.tree_map(
                    lambda a: a[a_idx], aux_mb
                )
                y = stage_fn(local_params, cur, aux_t)
                out_idx = jnp.clip(t - (num_stages - 1), 0, m - 1)
                is_out = jnp.logical_and(
                    s == num_stages - 1, t >= num_stages - 1
                )
                outputs = outputs.at[out_idx].set(
                    jnp.where(is_out, y, outputs[out_idx])
                )
                nxt = jax.lax.ppermute(
                    y, stage_axis,
                    [(i, i + 1) for i in range(num_stages - 1)],
                )
                return (nxt, outputs), None

            (_, outputs), _ = jax.lax.scan(
                tick, (buf, outputs), jnp.arange(m + num_stages - 1)
            )
            # Only the last stage holds real outputs; broadcast it to every
            # stage so out_specs can replicate.
            outputs = jax.lax.psum(
                jnp.where(s == num_stages - 1, outputs, 0.0), stage_axis
            )
            return outputs.reshape(x.shape[0], *x.shape[1:])

        act_spec = P(batch_axis) if batch_axis else P()
        aux_specs = jax.tree_util.tree_map(lambda _: act_spec, aux)
        return shard_map(
            shmap_body, mesh=mesh,
            in_specs=(P(stage_axis), act_spec, aux_specs),
            out_specs=act_spec,
        )(stage_params, x, aux)

    return pipelined
