"""FSDP (ZeRO-3-style) sharding tests on the virtual 8-device CPU mesh.

The reference trains with full AdamW replicas per DDP rank (reference:
main.py:354, SURVEY.md section 2.8 "ZeRO/FSDP: No"); vaw_tpu adds
param/opt-state sharding over the 'data' axis as a first-class option
(--fsdp). These tests assert (a) the specs actually shard, (b) the Adam
moments follow the param shardings, and (c) training math is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vaw_tpu.core import (
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import (
    fsdp_partition_specs, make_mesh, shard_batch, tree_shardings_like,
)
from vaw_tpu.train import Trainer
from vaw_tpu.utils.config import TrainConfig


def _setup(fsdp, model_axis=2):
    cfg = TrainConfig(
        model="DiT-S", image_size=8, in_chans=4, patch_size=2,
        num_classes=10, class_cond=True, batch_size=8,
        weight_type="lambda", mean_type="EPSILON", drop_label_prob=0.0,
        amp=False, fsdp=fsdp,
    )
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=2, num_classes=10,
                class_dropout_prob=0.0)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    mesh = make_mesh(model_axis=model_axis)
    trainer = Trainer(cfg, model, proc, mesh)
    batch = {
        "image": np.random.RandomState(0).randn(8, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    return trainer, mesh, batch


def test_fsdp_specs_shard_large_leaves():
    trainer, mesh, batch = _setup(fsdp=True)
    state = trainer.init_state(jax.random.key(0), batch)
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    seen_data = 0
    for path, leaf in flat:
        spec = leaf.sharding.spec
        if "data" in jax.tree_util.tree_leaves(tuple(spec)):
            seen_data += 1
            # the sharded axis must divide evenly
            axis = list(spec).index("data")
            assert leaf.shape[axis] % mesh.shape["data"] == 0
    assert seen_data > 0, "no parameter was FSDP-sharded"


def test_fsdp_min_size_keeps_small_leaves_replicated():
    params = {"small": jnp.zeros((8, 8)), "big": jnp.zeros((128, 256))}
    specs = fsdp_partition_specs(params, data_axis_size=4, rules=(),
                                 min_size=1 << 10)
    assert specs["small"] == P(None, None)
    assert "data" in tuple(specs["big"])


def test_adam_moments_follow_param_shardings():
    trainer, mesh, batch = _setup(fsdp=True)
    state = trainer.init_state(jax.random.key(0), batch)
    p_leaves = jax.tree_util.tree_leaves(state.params)
    p_shardings = [p.sharding for p in p_leaves]
    # find the ScaleByAdamState mu tree: leaves with matching structure
    found = False
    for entry in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
    ):
        if hasattr(entry, "mu"):
            mu_leaves = jax.tree_util.tree_leaves(entry.mu)
            assert [m.sharding for m in mu_leaves] == p_shardings
            found = True
    assert found


def test_fsdp_matches_replicated_training():
    t_rep, mesh, batch = _setup(fsdp=False)
    t_fsdp, _, _ = _setup(fsdp=True)
    s_rep = t_rep.init_state(jax.random.key(0), batch)
    s_fsdp = t_fsdp.init_state(jax.random.key(0), batch)
    db = shard_batch(mesh, batch)
    for _ in range(3):
        s_rep, m_rep = t_rep.step(s_rep, db)
        s_fsdp, m_fsdp = t_fsdp.step(s_fsdp, db)
    np.testing.assert_allclose(
        float(m_rep["loss"]), float(m_fsdp["loss"]), rtol=1e-5, atol=1e-6
    )
    # params agree leaf-by-leaf after 3 steps
    for a, b in zip(jax.tree_util.tree_leaves(s_rep.params),
                    jax.tree_util.tree_leaves(s_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tree_shardings_like_structure():
    from jax.sharding import NamedSharding

    mesh = make_mesh(model_axis=2)
    rep = NamedSharding(mesh, P())
    params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    p_sh = {"w": NamedSharding(mesh, P("data", None)), "b": rep}
    opt_state = (
        {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},  # mu-like
        jnp.zeros(()),  # count-like
    )
    sh = tree_shardings_like(
        opt_state, jax.tree_util.tree_structure(params), p_sh, rep
    )
    assert sh[0]["w"] == p_sh["w"]
    assert sh[0]["b"] == rep
    assert sh[1] == rep
