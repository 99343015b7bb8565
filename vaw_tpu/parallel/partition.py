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
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["transformer_partition_rules", "partition_specs",
           "shard_params", "param_shardings", "fsdp_partition_specs",
           "fsdp_param_shardings", "pp_param_shardings",
           "tree_shardings_like", "tp_rule_census",
           "assert_tp_rules_applied"]

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


def tp_rule_census(params, rules=TRANSFORMER_RULES):
    """-> (matched kernel paths, unmatched kernel paths). 'Kernel' = any
    2D+ leaf (the shardable matmuls; biases/scales follow their layer)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    matched, unmatched = [], []
    for path, leaf in flat.items():
        if len(getattr(leaf, "shape", ())) < 2:
            continue
        (matched if _spec_for(path, rules) != P() else unmatched).append(path)
    return matched, unmatched


def assert_tp_rules_applied(params, model_axis_size: int,
                            rules=TRANSFORMER_RULES, verbose: bool = True):
    """Fail fast when tensor parallelism is requested but the name-based
    rules matched nothing — a renamed module must not silently fall back to
    full replication. Logs the sharded-leaf census so a partial match is
    visible too."""
    if model_axis_size <= 1:
        return
    matched, unmatched = tp_rule_census(params, rules)
    if not matched:
        sample = sorted(unmatched)[:6]
        raise ValueError(
            f"model_axis={model_axis_size} but no TP partition rule matched "
            f"any kernel; the model would silently replicate. Kernel paths "
            f"seen: {sample}{'...' if len(unmatched) > 6 else ''} — extend "
            "TRANSFORMER_RULES or run with model_axis=1."
        )
    if verbose:
        print(f"[tp] model_axis={model_axis_size}: {len(matched)} kernels "
              f"sharded, {len(unmatched)} replicated")


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


def pp_param_shardings(mesh: Mesh, params, stage_axis: str = "stage"):
    """Pipeline-parallel shardings: the stacked block pytree (a scan-blocks
    DiT's `ScanBlocks/*`, parallel/dit_pipeline.py) shards its leading
    [depth] axis over `stage_axis` — each stage holds only its own blocks,
    the memory win that motivates PP — while the small embed/final params
    replicate."""
    flat = traverse_util.flatten_dict(params, sep="/")
    num_stages = int(mesh.shape[stage_axis])
    specs = {}
    for path, leaf in flat.items():
        if (path.startswith("ScanBlocks/")
                and getattr(leaf, "shape", ())
                and leaf.shape[0] % num_stages == 0):
            specs[path] = P(stage_axis)
        else:
            specs[path] = P()
    specs = traverse_util.unflatten_dict(specs, sep="/")
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


# --------------------------------------------------------------------- #
# FSDP (ZeRO-3-style fully-sharded data parallelism)
# --------------------------------------------------------------------- #

# Below this many elements a leaf stays replicated: all-gathering tiny
# params costs more latency than their memory is worth.
FSDP_MIN_SIZE = 1 << 14


def fsdp_partition_specs(params, data_axis_size: int,
                         rules=TRANSFORMER_RULES,
                         min_size: int = FSDP_MIN_SIZE):
    """TP specs extended with parameter sharding over 'data' (ZeRO-3).

    The reference has no equivalent — plain per-rank AdamW replicas
    (reference: main.py:354, SURVEY.md section 2.8). On a TPU mesh, sharding
    params/opt-state over 'data' costs one all-gather per layer in the
    forward (riding ICI, overlapped by XLA) and turns the gradient
    all-reduce into a reduce-scatter — memory drops by the data-axis size.

    Each leaf keeps its TP spec; the largest remaining divisible axis is
    then sharded over 'data'.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    specs = {}
    for path, leaf in flat.items():
        shape = getattr(leaf, "shape", ())
        base = _spec_for(path, rules)
        spec = list(base) + [None] * (len(shape) - len(base))
        if data_axis_size > 1 and np.prod(shape, dtype=np.int64) >= min_size:
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for i in order:
                if spec[i] is None and shape[i] % data_axis_size == 0:
                    spec[i] = "data"
                    break
        specs[path] = P(*spec)
    return traverse_util.unflatten_dict(specs, sep="/")


def fsdp_param_shardings(mesh: Mesh, params, rules=TRANSFORMER_RULES,
                         min_size: int = FSDP_MIN_SIZE):
    specs = fsdp_partition_specs(params, int(mesh.shape["data"]), rules,
                                 min_size)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def tree_shardings_like(tree, params_treedef, p_sh, replicated):
    """Shardings for an arbitrary state pytree (e.g. an optax opt-state):
    any subtree whose structure matches the param tree (Adam mu/nu, EMA)
    gets the param shardings; every other leaf replicates."""
    p_struct = params_treedef

    def walk(node):
        try:
            struct = jax.tree_util.tree_structure(node)
        except Exception:  # noqa: BLE001
            return replicated
        if struct == p_struct:
            return jax.tree_util.tree_unflatten(
                p_struct, jax.tree_util.tree_leaves(p_sh)
            )
        children, treedef = _one_level(node)
        if children is None:
            return replicated
        return jax.tree_util.tree_unflatten(
            treedef, [walk(c) for c in children]
        )

    return walk(tree)


def _one_level(node):
    """Split a pytree node into its immediate children, or (None, None) for
    leaves."""
    treedef = jax.tree_util.tree_structure(
        node, is_leaf=lambda x: x is not node
    )
    if treedef.num_leaves == 0:
        return [], treedef
    flat, _ = jax.tree_util.tree_flatten(
        node, is_leaf=lambda x: x is not node
    )
    if len(flat) == 1 and flat[0] is node:
        return None, None
    return flat, treedef
