"""Loss-aware timestep resampling wired into the train step, and the
distributed helpers."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from vaw_tpu.core import (
    GaussianDiffusion,
    get_named_beta_schedule,
    make_schedule,
)
from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import make_mesh
from vaw_tpu.parallel.distributed import (
    barrier,
    is_main_process,
    process_allgather,
)
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig


@pytest.mark.slow
def test_loss_second_moment_training():
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=3, patch_size=2,
        num_classes=0, class_cond=False, batch_size=8, amp=False, lr=1e-3,
        time_sampler="loss-second-moment", diffusion_steps=10,
    )
    model = DiT(image_size=8, patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_heads=2, num_classes=0, class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("cosine", 10))
    process = GaussianDiffusion(schedule=sched, rescale_timesteps=False)
    mesh = make_mesh(data_axis=1, model_axis=1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, model, process, mesh)
    assert trainer.resampler is not None

    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(8, 8, 8, 3), jnp.float32)}
    state = trainer.init_state(jax.random.key(0), batch)
    assert state.resampler is not None
    counts0 = np.asarray(state.resampler.loss_counts).sum()
    for _ in range(3):
        state, metrics = trainer.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    counts = np.asarray(state.resampler.loss_counts).sum()
    assert counts == counts0 + 3 * 8, "history must absorb 8 losses/step"


def test_uniform_has_no_resampler_state():
    cfg = TrainConfig(model="DiT-S", image_size=8, in_chans=3, patch_size=2,
                      num_classes=0, class_cond=False, batch_size=4,
                      amp=False)
    model = DiT(image_size=8, patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_heads=2, num_classes=0, class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("cosine", 10))
    process = GaussianDiffusion(schedule=sched, rescale_timesteps=False)
    mesh = make_mesh(data_axis=1, model_axis=1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, model, process, mesh)
    assert trainer.resampler is None  # uniform sampler -> no state
    batch = {"image": np.zeros((4, 8, 8, 3), np.float32)}
    state = trainer.init_state(jax.random.key(0), batch)
    assert state.resampler is None
    # the full step (incl. the fused-optimizer path) must not materialize
    # resampler state for the uniform sampler
    state, _ = trainer.step(state, batch)
    assert state.resampler is None


def test_distributed_helpers_single_process():
    assert is_main_process()
    barrier()  # no-op single process
    x = np.arange(4)
    np.testing.assert_array_equal(process_allgather(x), x)


def test_loss_second_moment_updates_under_grad_accumulation():
    """Per-microbatch (t, loss) pairs are stacked by the accumulation scan
    and folded into the resampler history — the full global batch counts,
    not just the first microbatch."""
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=3, patch_size=2,
        num_classes=0, class_cond=False, batch_size=8, amp=False, lr=1e-3,
        time_sampler="loss-second-moment", diffusion_steps=10,
        grad_accumulation=4,
    )
    model = DiT(image_size=8, patch_size=2, in_channels=3, hidden_size=32,
                depth=1, num_heads=2, num_classes=0, class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("cosine", 10))
    process = GaussianDiffusion(schedule=sched, rescale_timesteps=False)
    mesh = make_mesh(data_axis=1, model_axis=1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, model, process, mesh)

    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(8, 8, 8, 3), jnp.float32)}
    state = trainer.init_state(jax.random.key(0), batch)
    counts_before = np.asarray(state.resampler.loss_counts).copy()
    state, _ = trainer.step(state, batch)
    counts_after = np.asarray(state.resampler.loss_counts)
    # all 8 samples (4 microbatches x 2) must be recorded
    assert counts_after.sum() - counts_before.sum() == 8
