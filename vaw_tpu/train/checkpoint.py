"""Orbax checkpointing of the TrainState.

Replaces the reference's torch.save of {model, optimizer, step, ema_model}
state dicts (reference: tools/utils.py:93-120) with a single sharding-aware
Orbax checkpoint. File layout mirrors the reference:
  {logdir}/checkpoint/{model}_{mean_type}_{path_type}_{step}/
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_name"]


def checkpoint_name(cfg, step: int) -> str:
    """(reference: tools/utils.py:101-103)"""
    return f"{cfg.model}_{cfg.mean_type}_{cfg.path_type}_{step}"


def save_checkpoint(cfg, step: int, state: TrainState,
                    logdir: Optional[str] = None) -> str:
    logdir = logdir or cfg.logdir
    ckpt_dir = os.path.abspath(os.path.join(logdir, "checkpoint"))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, checkpoint_name(cfg, step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(ckpt_path: str, abstract_state: TrainState) -> TrainState:
    """Restore into the sharding/layout of `abstract_state`
    (reference: tools/utils.py:109-120 returns the raw dict; here the state
    pytree directly)."""
    ckpt_path = os.path.abspath(ckpt_path)
    assert os.path.exists(ckpt_path), f"checkpoint {ckpt_path} not found"
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          abstract_state)
        return ckptr.restore(ckpt_path, abstract)
