"""Parameter partition rules for tensor parallelism.

The reference is data-parallel only (SURVEY.md section 2.8); this module adds
the 2D-mesh extension: Megatron-style column/row sharding of transformer
qkv/proj/mlp kernels over the 'model' axis, expressed as PartitionSpec trees
consumed by NamedSharding. XLA inserts the all-reduces (ICI) implied by the
row-sharded second matmuls.
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["transformer_partition_rules", "partition_specs",
           "shard_params", "param_shardings"]

# (path regex, spec) — first match wins. Column-parallel: shard output dim;
# row-parallel: shard input dim so the following contraction reduces over
# 'model' (XLA emits one psum per block).
TRANSFORMER_RULES: Tuple[Tuple[str, P], ...] = (
    # fused qkv / first MLP matmul -> column parallel
    (r".*MultiHeadSelfAttention_\d+/Dense_0/kernel", P(None, "model")),
    (r".*ViTAttention_\d+/Dense_0/kernel", P(None, "model")),
    (r".*Mlp_\d+/Dense_0/kernel", P(None, "model")),
    # attention proj / second MLP matmul -> row parallel
    (r".*MultiHeadSelfAttention_\d+/Dense_1/kernel", P("model", None)),
    (r".*ViTAttention_\d+/Dense_1/kernel", P("model", None)),
    (r".*Mlp_\d+/Dense_1/kernel", P("model", None)),
    # biases of column-parallel layers follow the output sharding
    (r".*MultiHeadSelfAttention_\d+/Dense_0/bias", P("model")),
    (r".*ViTAttention_\d+/Dense_0/bias", P("model")),
    (r".*Mlp_\d+/Dense_0/bias", P("model")),
)


def transformer_partition_rules():
    return TRANSFORMER_RULES


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def partition_specs(params, rules=TRANSFORMER_RULES):
    """PartitionSpec pytree matching `params` (flax FrozenDict or dict)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    specs = {k: _spec_for(k, rules) for k in flat}
    return traverse_util.unflatten_dict(specs, sep="/")


def param_shardings(mesh: Mesh, params, rules=TRANSFORMER_RULES):
    specs = partition_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params, rules=TRANSFORMER_RULES):
    """Device-put params with TP shardings (replicated where no rule hits)."""
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
