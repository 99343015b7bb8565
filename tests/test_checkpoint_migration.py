"""Migration story: a user of the reference framework loads their trained
torch DiT checkpoint into vaw_tpu and continues — convert, train a step,
sample. Forward parity is covered by test_backbone_parity; this seals the
end-to-end plumbing (converted tree == trainer tree, optimizer and sampler
accept it)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "tests")
from _reference import load_reference, state_dict_numpy  # noqa: E402

from vaw_tpu.core import (  # noqa: E402
    GaussianDiffusion, ModelMeanType, get_named_beta_schedule, make_schedule,
)
from vaw_tpu.models.convert import convert_dit  # noqa: E402
from vaw_tpu.models.dit import DiT  # noqa: E402
from vaw_tpu.parallel import make_mesh  # noqa: E402
from vaw_tpu.train import Trainer  # noqa: E402
from vaw_tpu.utils.config import TrainConfig  # noqa: E402


def test_torch_dit_checkpoint_trains_and_samples():
    ref_dit = load_reference("models.dit")
    torch.manual_seed(0)
    ref_model = ref_dit.DiT(image_size=8, patch_size=2, in_channels=4,
                            hidden_size=32, depth=2, num_heads=2,
                            num_classes=10, learn_sigma=False)
    sd = state_dict_numpy(ref_model)

    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10,
                class_dropout_prob=0.1)
    cfg = TrainConfig(model="DiT-S", image_size=8, in_chans=4, patch_size=2,
                      num_classes=10, class_cond=True, batch_size=8,
                      weight_type="lambda", mean_type="EPSILON", amp=False,
                      drop_label_prob=0.1)
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

    # convert the torch checkpoint against the live param tree (validates
    # paths + shapes), then swap it into the train state
    params = convert_dit(sd, target_params=jax.device_get(state.params))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = state.replace(params=params,
                          ema_params=jax.tree_util.tree_map(jnp.copy, params))

    state, metrics = trainer.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    def model_fn(x, t, **kw):
        out, _ = model.apply({"params": state.ema_params}, x, t, **kw)
        return out

    samples = proc.ddim_sample_loop(
        lambda x, t, **kw: model_fn(x, t, y=jnp.zeros((4,), jnp.int32)),
        jax.random.key(1), (4, 8, 8, 4))
    assert np.isfinite(np.asarray(samples)).all()


def _tiny_setup(fsdp=False, mesh=None, scan_blocks=False, depth=2):
    cfg = TrainConfig(model="DiT-S", image_size=8, in_chans=4, patch_size=2,
                      num_classes=10, class_cond=True, batch_size=8,
                      weight_type="lambda", mean_type="EPSILON", amp=False,
                      drop_label_prob=0.1, fsdp=fsdp,
                      scan_blocks=scan_blocks)
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=depth, num_heads=2, num_classes=10,
                class_dropout_prob=0.1, scan_blocks=scan_blocks)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    trainer = Trainer(cfg, model, proc, mesh or make_mesh())
    batch = {
        "image": np.random.RandomState(0).randn(8, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    return cfg, trainer, batch


def _assert_tree_bitequal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(jax.device_get(a))
    fb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_array_equal(la, lb, err_msg=str(path))


def test_fsdp_checkpoint_restores_onto_plain_dp(tmp_path):
    """Topology migration (VERDICT r2 next-9): save under a
    ('data','model') ZeRO-3 mesh, restore onto plain dp — a preempted pod
    must be able to come back with a different topology. The reference's
    single-file torch checkpoint supports this trivially
    (tools/utils.py:109-120); the Orbax + sharding path must too."""
    from vaw_tpu.train import load_checkpoint, save_checkpoint

    fsdp_mesh = make_mesh(data_axis=4, model_axis=2)
    cfg, fsdp_trainer, batch = _tiny_setup(fsdp=True, mesh=fsdp_mesh)
    with fsdp_mesh:
        state = fsdp_trainer.init_state(jax.random.key(0), batch)
        state, _ = fsdp_trainer.step(state, batch)
        cfg.logdir = str(tmp_path)
        path = save_checkpoint(cfg, 1, state)
        saved = jax.device_get(state)

    dp_mesh = make_mesh(data_axis=len(jax.devices()), model_axis=1)
    cfg2, dp_trainer, _ = _tiny_setup(fsdp=False, mesh=dp_mesh)
    with dp_mesh:
        dp_state = dp_trainer.init_state(jax.random.key(7), batch)
        restored = load_checkpoint(path, dp_state)
        assert int(restored.step) == 1
        _assert_tree_bitequal(saved.params, restored.params)
        _assert_tree_bitequal(saved.ema_params, restored.ema_params)
        _assert_tree_bitequal(saved.opt_state, restored.opt_state)
        # restored params must be usable: a dp step runs and stays finite
        restored, metrics = dp_trainer.step(restored, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(restored.step) == 2
        # and the restored leaves really live on the dp mesh layout
        leaf = jax.tree_util.tree_leaves(restored.params)[0]
        assert leaf.sharding.is_fully_replicated


def test_pp_checkpoint_restores_onto_plain_dp(tmp_path):
    """pp -> dp migration: a GPipe-stage-sharded checkpoint restores onto a
    data-only mesh bit-exactly and resumes."""
    from vaw_tpu.parallel.dit_pipeline import pipelined_dit_apply
    from vaw_tpu.parallel.mesh import make_pp_mesh
    from vaw_tpu.train import load_checkpoint, save_checkpoint
    from vaw_tpu.core import GaussianDiffusion, ModelMeanType

    stages = 2
    pp_mesh = make_pp_mesh(stages)
    cfg, _, batch = _tiny_setup(scan_blocks=True, depth=4)
    cfg.pp_stages = stages
    cfg.pp_microbatches = 2
    model = DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=4, num_heads=2, num_classes=10,
                class_dropout_prob=0.1, scan_blocks=True)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type)
    apply_fn = pipelined_dit_apply(model, pp_mesh, 2, batch_axis="data")
    with pp_mesh:
        trainer = Trainer(cfg, model, proc, pp_mesh, apply_fn=apply_fn)
        state = trainer.init_state(jax.random.key(0), batch)
        state, _ = trainer.step(state, batch)
        cfg.logdir = str(tmp_path)
        path = save_checkpoint(cfg, 1, state)
        saved = jax.device_get(state)

    dp_mesh = make_mesh(data_axis=len(jax.devices()), model_axis=1)
    cfg2, dp_trainer, _ = _tiny_setup(scan_blocks=True, depth=4,
                                      mesh=dp_mesh)
    with dp_mesh:
        dp_state = dp_trainer.init_state(jax.random.key(9), batch)
        restored = load_checkpoint(path, dp_state)
        _assert_tree_bitequal(saved.params, restored.params)
        restored, metrics = dp_trainer.step(restored, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(restored.step) == 2
