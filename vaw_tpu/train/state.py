"""Train state: one pytree holding {step, params, ema_params, opt_state}.

Replaces the reference's four separately-checkpointed objects
(model/ema_model/optimizer state dicts + step, tools/utils.py:93-120) and its
rank-0-only EMA + broadcast pattern (tools/trainer.py:64-66,
tools/sampler.py:92-94): EMA lives in the replicated/sharded state, so it is
always consistent on every chip with no broadcast.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

__all__ = ["TrainState", "ema_update"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    # Optional loss-aware timestep-resampler history (core.weighting
    # .ResamplerState); None for uniform sampling. Lives in the state so it
    # replicates for free under SPMD (the reference all_gathers per-rank
    # numpy history instead, tools/resample.py:84-106).
    resampler: Any = None


def ema_update(params, ema_params, decay: float):
    """ema <- ema * decay + params * (1 - decay)
    (reference: tools/trainer.py:12-18), fused into the train step."""
    import jax

    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
