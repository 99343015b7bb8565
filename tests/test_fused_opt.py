"""Fused AdamW+EMA (train/fused_opt.py) must reproduce the optax pipeline
exactly — same params, EMA, and opt-state over multiple steps, including
warmup/cosine schedule and weight decay."""

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
from vaw_tpu.train.fused_opt import fused_adamw_ema, find_adam_state
from vaw_tpu.train.trainer import make_optimizer, warmup_cosine_lr
from vaw_tpu.utils.config import TrainConfig


def _cfg(**kw):
    base = dict(model="DiT-S", image_size=8, in_chans=4, patch_size=2,
                num_classes=10, class_cond=True, batch_size=8,
                weight_type="lambda", mean_type="EPSILON", amp=False,
                lr=1e-3, warmup_steps=3, cosine_decay=True, total_steps=20,
                weight_decay=0.01, ema_decay=0.99)
    base.update(kw)
    return TrainConfig(**base)


def test_fused_matches_optax_multi_step():
    cfg = _cfg()
    rs = np.random.RandomState(0)
    params = {"a": jnp.asarray(rs.randn(32, 16), jnp.float32),
              "b": {"k": jnp.asarray(rs.randn(16), jnp.float32)}}
    ema = jax.tree_util.tree_map(jnp.copy, params)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    p_ref, e_ref, s_ref = params, ema, opt_state
    p_f, e_f, s_f = params, ema, opt_state
    import optax
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rs.randn(*p.shape) * 0.1, jnp.float32), params)
        updates, s_ref = tx.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        e_ref = jax.tree_util.tree_map(
            lambda e, p: e * cfg.ema_decay + p * (1 - cfg.ema_decay),
            e_ref, p_ref)

        p_f, e_f, s_f = fused_adamw_ema(
            p_f, grads, s_f, e_f, lr_fn=warmup_cosine_lr(cfg),
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay, ema_decay=cfg.ema_decay)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6),
            (p_ref, e_ref), (p_f, e_f))
        _, adam_ref = find_adam_state(s_ref)
        _, adam_f = find_adam_state(s_f)
        assert int(adam_ref.count) == int(adam_f.count) == step + 1
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6),
            (adam_ref.mu, adam_ref.nu), (adam_f.mu, adam_f.nu))


def _run_steps(cfg, n=3):
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10,
                class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    trainer = Trainer(cfg, model, proc, make_mesh())
    batch = {
        "image": np.random.RandomState(0).randn(8, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    state = trainer.init_state(jax.random.key(0), batch)
    for _ in range(n):
        state, metrics = trainer.step(state, batch)
    return state, metrics


def test_trainer_fused_vs_unfused_states_match():
    # fused run doubles as the log_grad_norm=False coverage (one compile
    # fewer in the default suite)
    s_fused, m_fused = _run_steps(
        _cfg(fused_optimizer=True, log_grad_norm=False))
    s_plain, m_plain = _run_steps(_cfg(fused_optimizer=False))
    assert "grad_norm" not in m_fused
    assert "grad_norm" in m_plain
    np.testing.assert_allclose(float(m_fused["loss"]),
                               float(m_plain["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5),
        (s_fused.params, s_fused.ema_params),
        (s_plain.params, s_plain.ema_params))


def test_grad_clip_forces_optax_path():
    cfg = _cfg(grad_clip=1.0)
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10,
                class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    trainer = Trainer(cfg, model, proc, make_mesh())
    assert not trainer._use_fused_opt()




def test_bf16_moments_close_to_f32():
    """--opt_bf16_moments: bf16 moment STORAGE, f32 update math. Params must
    track the f32-moment run closely over several steps (the only error
    source is the bf16 round-trip of mu/nu), and the state dtypes must
    actually be bf16 (the traffic saving is the point)."""
    s_f32, m_f32 = _run_steps(
        _cfg(fused_optimizer=True, log_grad_norm=False), n=5)
    s_bf, m_bf = _run_steps(
        _cfg(fused_optimizer=True, log_grad_norm=False,
             opt_bf16_moments=True), n=5)
    _, adam = find_adam_state(s_bf.opt_state)
    for leaf in jax.tree_util.tree_leaves((adam.mu, adam.nu)):
        assert leaf.dtype == jnp.bfloat16, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(s_bf.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    np.testing.assert_allclose(float(m_bf["loss"]), float(m_f32["loss"]),
                               rtol=5e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3),
        (s_bf.params, s_bf.ema_params),
        (s_f32.params, s_f32.ema_params))


def test_bf16_moments_requires_fused():
    with pytest.raises(ValueError, match="fused"):
        _run_steps(_cfg(fused_optimizer=False, opt_bf16_moments=True), n=1)
