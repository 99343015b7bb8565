"""Run artifacts: logdir layout, config snapshot, metrics CSV, sample grids.

Keeps the reference's artifact layout byte-for-byte where it matters
(reference: tools/utils.py:33-60, 123-165, 190-201):
  {logdir}/{timestamp}/config.yaml
  {logdir}/{timestamp}/code/**            (source snapshot)
  {logdir}/{timestamp}/sample/{step}.png  (grids)
  {logdir}/{timestamp}/generate_sample/{dataset}_{H}x{W}_samples.npz
  {logdir}/{timestamp}/metrics.csv
"""

from __future__ import annotations

import csv
import math
import os
import shutil
import sys
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

import numpy as np

__all__ = [
    "generate_logdir",
    "snapshot_sources",
    "save_metrics_to_csv",
    "make_grid",
    "save_grid_png",
    "save_eval_npz",
]


def snapshot_sources(logdir: str):
    """Copy the framework's own sources into {logdir}/code
    (reference: tools/utils.py:33-49)."""
    project_root = Path(__file__).resolve().parents[2]
    dst_root = Path(logdir) / "code"
    for pattern in ("*.py", "*.cpp", "*.cu", "*.cc", "*.h"):
        for src in (project_root / "vaw_tpu").rglob(pattern):
            if "__pycache__" in src.parts:
                continue
            dst = dst_root / src.relative_to(project_root)
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)


def _consistent_timestamp() -> str:
    """Run timestamp, identical on every process: checkpointing is a
    collective Orbax write, so all hosts must agree on the logdir. Process 0
    picks the time and broadcasts it (reference rank-0 idiom,
    tools/utils.py:33-60)."""
    import time as _time

    import jax

    seconds = int(_time.time())
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        import numpy as _np

        seconds = int(multihost_utils.broadcast_one_to_all(
            _np.int64(seconds)
        ))
    return datetime.fromtimestamp(seconds).strftime("%Y%m%d-%H%M%S")


def generate_logdir(cfg, snapshot: bool = True) -> str:
    """Create {logdir}/{timestamp}, snapshot sources + config.yaml
    (reference: tools/utils.py:51-60). Mutates cfg.logdir like the reference
    mutates args.logdir. Only the main process writes artifacts
    (reference: tools/dist_util.py:20-27 gating)."""
    import yaml

    from ..parallel.distributed import is_main_process

    timestamp = _consistent_timestamp()
    logdir = os.path.join(cfg.logdir, timestamp)
    cfg.logdir = logdir
    # EVERY process creates the run directory (cheap, idempotent): Orbax
    # checkpoint writes are collective, and on per-host local filesystems
    # the non-main writers would otherwise target a nonexistent path.
    # Artifact snapshots below stay main-process-only.
    os.makedirs(logdir, exist_ok=True)
    if not is_main_process():
        return logdir
    if snapshot:
        snapshot_sources(logdir)
    with open(os.path.join(logdir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
    return logdir


def save_metrics_to_csv(logdir: str, metrics: Dict, step: int):
    """Append one row per eval (reference: tools/utils.py:190-201)."""
    path = os.path.join(logdir, "metrics.csv")
    exists = os.path.isfile(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["Step"] + list(metrics.keys()))
        w.writerow(
            [step]
            + [f"{v:.2f}" if isinstance(v, (int, float)) else v
               for v in metrics.values()]
        )


def make_grid(images: np.ndarray, nrow: Optional[int] = None,
              pad: int = 2, pad_value: int = 128) -> np.ndarray:
    """uint8 NHWC -> one uint8 HWC grid (torchvision make_grid equivalent,
    reference: tools/utils.py:140-146)."""
    n, h, w, c = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.full(
        (ncol * (h + pad) + pad, nrow * (w + pad) + pad, c), pad_value,
        np.uint8,
    )
    for i in range(n):
        r, cc = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = cc * (w + pad) + pad
        grid[y: y + h, x: x + w] = images[i]
    return grid


def save_grid_png(logdir: str, step: int, images: np.ndarray) -> str:
    from PIL import Image

    sample_dir = os.path.join(logdir, "sample")
    os.makedirs(sample_dir, exist_ok=True)
    path = os.path.join(sample_dir, f"{step}.png")
    grid = make_grid(images)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
    return path


def save_eval_npz(logdir: str, dataset: str, samples: np.ndarray,
                  labels: Optional[np.ndarray] = None) -> str:
    """(reference: tools/utils.py:148-161)"""
    sample_dir = os.path.join(logdir, "generate_sample")
    os.makedirs(sample_dir, exist_ok=True)
    shape_str = "x".join(str(x) for x in samples.shape[1:3])
    path = os.path.join(sample_dir, f"{dataset}_{shape_str}_samples.npz")
    if labels is not None:
        np.savez(path, samples, labels)
    else:
        np.savez(path, samples)
    return path
