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

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_name",
           "AsyncCheckpointWriter"]


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


class AsyncCheckpointWriter:
    """Non-blocking checkpoint writes (the TPU extension SURVEY.md section 5
    notes: the reference has only synchronous torch.save on rank 0,
    tools/utils.py:93-107). Device arrays are snapshotted and serialized on
    a background thread while training continues; `wait()` joins the
    in-flight write, and starting a new save joins the previous one first
    (Orbax serializes per-checkpointer)."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, cfg, step: int, state: TrainState,
             logdir: Optional[str] = None) -> str:
        logdir = logdir or cfg.logdir
        ckpt_dir = os.path.abspath(os.path.join(logdir, "checkpoint"))
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, checkpoint_name(cfg, step))
        self._ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return path

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


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
