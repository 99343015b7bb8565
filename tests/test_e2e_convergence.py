"""End-to-end learning correctness: train a tiny DiT on a known Gaussian
target distribution and verify DDIM sampling RECOVERS its statistics —
stronger than loss-decreases (a miswired sampler or schedule can pass
that while generating garbage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import make_mesh
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig

TARGET_MEAN, TARGET_STD = 0.7, 0.35


@pytest.mark.slow
def test_training_recovers_target_gaussian():
    cfg = TrainConfig(model="DiT-S", image_size=8, in_chans=2, patch_size=2,
                      num_classes=0, class_cond=False, batch_size=64,
                      weight_type="constant", mean_type="EPSILON", amp=False,
                      lr=2e-3, warmup_steps=10, cosine_decay=False,
                      ema_decay=0.95)
    model = DiT(image_size=8, patch_size=2, in_channels=2, hidden_size=64,
                depth=3, num_heads=4, num_classes=0, class_dropout_prob=0.0)
    T = 50
    sched = make_schedule(get_named_beta_schedule("linear", T))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    mesh = make_mesh()
    trainer = Trainer(cfg, model, proc, mesh)

    rs = np.random.RandomState(0)

    def batch():
        return {"image": (rs.randn(64, 8, 8, 2) * TARGET_STD
                          + TARGET_MEAN).astype(np.float32)}

    state = trainer.init_state(jax.random.key(0), batch())
    losses = []
    for _ in range(300):
        state, m = trainer.step(state, batch())
        losses.append(float(m["loss"]))
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])

    def model_fn(x, t, **kw):
        out, _ = model.apply({"params": state.ema_params}, x, t)
        return out

    samples = proc.ddim_sample_loop(
        model_fn, jax.random.key(7), (256, 8, 8, 2), clip_denoised=True)
    samples = np.asarray(samples)
    # distribution recovery: mean within 0.1, std within 35%
    assert abs(samples.mean() - TARGET_MEAN) < 0.1, samples.mean()
    assert abs(samples.std() - TARGET_STD) / TARGET_STD < 0.35, samples.std()
