"""Pipeline parallelism on the real DiT backbone (VERDICT r1 item 8):
dp-vs-pp forward, gradient, and full-train-step equality on the virtual
CPU mesh. The reference has no PP (SURVEY.md §2.8); these tests pin the
TPU extension's math to the plain data-parallel path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import (
    make_mesh, make_pp_mesh, pipelined_dit_apply, stage_block_params,
)
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig


def _tiny_dit(depth=4):
    return DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
               depth=depth, num_heads=2, num_classes=10,
               class_dropout_prob=0.0, scan_blocks=True)


def _init(model, batch=8):
    x = jnp.ones((batch, 8, 8, 4))
    t = jnp.zeros((batch,))
    y = jnp.zeros((batch,), jnp.int32)
    rngs = {"params": jax.random.key(0),
            "label_dropout": jax.random.key(1)}
    return model.init(rngs, x, t, y), (x, t, y)


def _rand_inputs(batch=8):
    rs = np.random.RandomState(3)
    return (jnp.asarray(rs.randn(batch, 8, 8, 4).astype(np.float32)),
            jnp.asarray(rs.rand(batch).astype(np.float32) * 10),
            jnp.asarray((np.arange(batch) % 10).astype(np.int32)))


def test_stage_block_params_regroups_depth():
    model = _tiny_dit(depth=4)
    variables, _ = _init(model)
    staged = stage_block_params(variables["params"], 2)
    leaves = jax.tree_util.tree_leaves(staged)
    assert all(l.shape[:2] == (2, 2) for l in leaves)


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4)])
def test_pp_forward_matches_plain_dit(stages, microbatches):
    model = _tiny_dit(depth=4)
    variables, _ = _init(model)
    x, t, y = _rand_inputs()
    ref, _ = model.apply(variables, x, t, y)

    mesh = Mesh(np.array(jax.devices()[:stages]), ("stage",))
    apply_fn = pipelined_dit_apply(model, mesh, microbatches)
    out, _ = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))(
        variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_grads_match_plain_dit():
    model = _tiny_dit(depth=4)
    variables, _ = _init(model)
    x, t, y = _rand_inputs()
    target = jnp.asarray(
        np.random.RandomState(9).randn(*x.shape).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    apply_fn = pipelined_dit_apply(model, mesh, 4)

    def loss_plain(params):
        out, _ = model.apply({"params": params}, x, t, y)
        return jnp.mean((out - target) ** 2)

    def loss_pp(params):
        out, _ = apply_fn({"params": params}, x, t, y)
        return jnp.mean((out - target) ** 2)

    g_ref = jax.jit(jax.grad(loss_plain))(variables["params"])
    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_ref, g_pp,
    )


def test_dp_pp_forward_on_2d_mesh():
    model = _tiny_dit(depth=4)
    variables, _ = _init(model)
    x, t, y = _rand_inputs()
    ref, _ = model.apply(variables, x, t, y)

    mesh = make_pp_mesh(4)  # 2 data x 4 stage on the 8-device CPU mesh
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    apply_fn = pipelined_dit_apply(model, mesh, 2, batch_axis="data")
    out, _ = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))(
        variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _make_trainer(mesh, apply_fn=None):
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=4, patch_size=2,
        num_classes=10, class_cond=True, batch_size=8,
        weight_type="lambda", mean_type="EPSILON", amp=False,
        scan_blocks=True, lr=1e-3, warmup_steps=0, cosine_decay=False,
        grad_clip=0.0,
    )
    model = _tiny_dit(depth=4)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    return Trainer(cfg, model, proc, mesh, apply_fn=apply_fn)


@pytest.mark.slow
def test_pp_train_step_matches_dp():
    """One full donated train step (loss + AdamW + EMA) under dp+pp equals
    the dp-only step: same state in, same params/loss out."""
    batch = {
        "image": np.random.RandomState(0).randn(8, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }

    dp = _make_trainer(make_mesh())
    state_dp = dp.init_state(jax.random.key(0), batch)
    state_dp, m_dp = dp.step(state_dp, batch)

    mesh = make_pp_mesh(4)
    pp_apply = pipelined_dit_apply(dp.model, mesh, 2, batch_axis="data")
    pp = _make_trainer(mesh, apply_fn=pp_apply)
    state_pp = pp.init_state(jax.random.key(0), batch)
    # pp params shard the block stack over 'stage'
    block_leaf = state_pp.params["ScanBlocks"]["DiTBlock_0"][
        "Mlp_0"]["Dense_0"]["kernel"]
    assert "stage" in jax.tree_util.tree_leaves(
        tuple(block_leaf.sharding.spec))
    state_pp, m_pp = pp.step(state_pp, batch)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        state_pp.params, state_dp.params,
    )
