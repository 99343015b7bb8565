"""Async Orbax checkpointing: non-blocking save must produce a checkpoint
that restores bit-identically (the reference has only synchronous rank-0
torch.save, tools/utils.py:93-107; async writes are the TPU extension noted
in SURVEY.md section 5)."""

import jax
import pytest
import numpy as np

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import make_mesh, shard_batch
from vaw_tpu.train import Trainer, load_checkpoint
from vaw_tpu.train.checkpoint import AsyncCheckpointWriter
from vaw_tpu.utils.config import TrainConfig


@pytest.mark.slow
def test_async_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=4, patch_size=2,
        num_classes=10, class_cond=True, batch_size=8,
        weight_type="lambda", mean_type="EPSILON", amp=False,
        logdir=str(tmp_path),
    )
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=1, num_heads=2, num_classes=10)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, proc, mesh)
    batch = {
        "image": np.random.RandomState(0).randn(8, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    state = trainer.init_state(jax.random.key(0), batch)
    state, _ = trainer.step(state, shard_batch(mesh, batch))

    with AsyncCheckpointWriter() as writer:
        path = writer.save(cfg, 1, state)
        writer.wait()

    restored = load_checkpoint(path, state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
