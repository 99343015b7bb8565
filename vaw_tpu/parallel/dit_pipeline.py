"""Pipeline-parallel DiT forward: real DiTBlocks over a 'stage' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.8); this composes
the GPipe schedule (parallel/pipeline.py) with the flagship backbone. A
scan-blocks DiT (models/dit.py, scan_blocks=True) already stores its blocks
as one stacked [depth, ...] pytree — exactly the layout the pipeline
shards into [stages, depth/stages, ...]. The embedding (patch + pos + t/y
conditioning) and the final adaLN head are tiny and run replicated on
every stage; only the depth-proportional block stack is pipelined.

The returned function is a drop-in for `model.apply` in the Trainer
(train/trainer.py model_fn), so the same donated train step works under
pp: grads flow through the shard_map transpose and keep the stage
sharding on the block stack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.dit import DiT, DiTBlock, FinalLayer
from ..models.layers import (
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
)
from .pipeline import pipeline

__all__ = ["pipelined_dit_apply", "stage_block_params", "BLOCK_STACK_KEY"]

BLOCK_STACK_KEY = "ScanBlocks"


def stage_block_params(params, num_stages: int):
    """ScanBlocks [depth, ...] leaves -> [S, depth/S, ...]."""
    stack = params[BLOCK_STACK_KEY]
    (child,) = stack.keys()  # DiTBlock_0 (remat keeps the name)

    def regroup(p):
        depth = p.shape[0]
        assert depth % num_stages == 0, (depth, num_stages)
        return p.reshape(num_stages, depth // num_stages, *p.shape[1:])

    return jax.tree_util.tree_map(regroup, stack[child])


def pipelined_dit_apply(model: DiT, mesh: Mesh, num_microbatches: int,
                        stage_axis: str = "stage",
                        batch_axis: Optional[str] = None):
    """Build an apply function running `model`'s blocks pipelined.

    Requires model.scan_blocks (stacked block params) and
    model.depth % mesh.shape[stage_axis] == 0. Signature matches
    `model.apply`: apply_fn(variables, x, t, y=None, train=False,
    force_drop_ids=None, rngs=None) -> (out, None).
    """
    assert model.scan_blocks, "pipelined DiT needs scan_blocks=True"
    num_stages = int(mesh.shape[stage_axis])
    assert model.depth % num_stages == 0, (model.depth, num_stages)

    block = DiTBlock(model.hidden_size, model.num_heads, model.mlp_ratio,
                     dtype=model.dtype)

    def block_fn(block_params, x, c):
        return block.apply({"params": block_params}, x, c)

    pp = pipeline(block_fn, mesh, num_microbatches, stage_axis=stage_axis,
                  batch_axis=batch_axis)

    out_channels = (model.in_channels * 2 if model.learn_sigma
                    else model.in_channels)
    grid = model.image_size // model.patch_size
    pos_embed = get_2d_sincos_pos_embed(model.hidden_size, grid)

    patcher = PatchEmbed(model.patch_size, model.hidden_size,
                         dtype=model.dtype)
    t_emb = TimestepEmbedder(model.hidden_size, dtype=model.dtype)
    y_emb = (LabelEmbedder(model.num_classes, model.hidden_size,
                           model.class_dropout_prob)
             if model.num_classes > 0 else None)
    final = FinalLayer(model.hidden_size, model.patch_size, out_channels,
                       dtype=model.dtype)

    def apply_fn(variables, x, t, y=None, train: bool = False,
                 force_drop_ids=None, rngs=None):
        params = variables["params"]
        h = patcher.apply({"params": params["PatchEmbed_0"]},
                          x.astype(model.dtype))
        h = h + jnp.asarray(pos_embed, model.dtype)[None]
        c = t_emb.apply({"params": params["TimestepEmbedder_0"]}, t)
        if y_emb is not None:
            assert y is not None
            c = c + y_emb.apply(
                {"params": params["LabelEmbedder_0"]}, y, train=train,
                force_drop_ids=force_drop_ids,
                rngs=({"label_dropout": rngs["label_dropout"]}
                      if rngs and "label_dropout" in rngs else None),
            ).astype(model.dtype)

        h = pp(stage_block_params(params, num_stages), h, c)

        out = final.apply({"params": params["FinalLayer_0"]}, h, c)
        out = model._unpatchify(out, out_channels)
        return out.astype(jnp.float32), None

    return apply_fn
