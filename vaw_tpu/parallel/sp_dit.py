"""Sequence-parallel DiT forward: token rows sharded over an 'sp' axis.

The reference never shards the sequence (SURVEY.md §5 — max ~1026 image
tokens, always full single-device attention); this is the documented TPU
extension path made reachable from the flagship backbone. The whole DiT
runs inside ONE shard_map over the `sp` axis:

  - the input image shards its H rows; the patch conv is stride==kernel so
    each shard embeds its own token rows with no halo,
  - the frozen sin-cos pos table is sliced per shard by axis_index
    (models/dit.py seq_axis handling),
  - per-token compute (adaLN modulation, LayerNorm, MLP, final layer,
    unpatchify) stays local,
  - attention runs as the ppermute ring with online-softmax accumulation
    (parallel/ring_attention.py ring_attention_local) — no device ever
    holds the full K/V.

Composable with data parallelism via `batch_axis` on a ('data','sp') mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dit import DiT

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["sequence_parallel_dit_apply"]


def sequence_parallel_dit_apply(model: DiT, mesh: Mesh,
                                seq_axis: str = "sp",
                                batch_axis: Optional[str] = None):
    """Build an apply function running `model` sequence-parallel.

    Requires (image_size // patch_size) % mesh.shape[seq_axis] == 0 and no
    REPA tap (the projector would need an all-gather). Signature matches
    `model.apply`: apply_fn(variables, x, t, y=None, train=False,
    force_drop_ids=None, rngs=None) -> (out, zs=None).
    """
    assert not model.learn_align, (
        "sequence-parallel DiT does not support the REPA tap"
    )
    n_sp = int(mesh.shape[seq_axis])
    grid = model.image_size // model.patch_size
    assert grid % n_sp == 0, (grid, n_sp)
    sp_model = model.clone(seq_axis=seq_axis)

    img_spec = P(batch_axis, seq_axis, None, None)
    vec_spec = P(batch_axis)

    def apply_fn(variables, x, t, y=None, train: bool = False,
                 force_drop_ids=None, rngs=None):
        def body(params, x, t, y):
            local_rngs = rngs
            if rngs and batch_axis is not None:
                # Closure-captured rngs replicate across the mesh; fold in
                # the data-shard index so label-dropout masks are i.i.d.
                # per sample rather than identical on every data shard.
                idx = jax.lax.axis_index(batch_axis)
                local_rngs = {k: jax.random.fold_in(r, idx)
                              for k, r in rngs.items()}
            out, zs = sp_model.apply(
                {"params": params}, x, t, y, train=train,
                force_drop_ids=force_drop_ids, rngs=local_rngs,
            )
            return out

        in_specs = (P(), img_spec, vec_spec,
                    vec_spec if y is not None else P())
        out = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=img_spec,
        )(variables["params"], x, t, y)
        return out, None

    return apply_fn
