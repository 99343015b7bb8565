"""MM-DiT differential parity vs the reference torch implementation
(reference: encoders/mmdit.py MMDiT) — default (LayerNorm + GELU-tanh, no
qk-norm) and SD3-flavored (rmsnorm + swiglu + rms qk-norm + scale-mod-only
+ register tokens) configurations, with the VectorEmbedder conditioning
path, the context_embedder, the cropped 16-grid pos table, and the REPA
projector tap."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from _reference import load_reference, state_dict_numpy  # noqa: E402

from vaw_tpu.models.convert import convert_mmdit  # noqa: E402
from vaw_tpu.models.mmdit import MMDiT  # noqa: E402

ATOL = 3e-4


def _perturb(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.03 * torch.randn(p.shape, generator=g))


@pytest.mark.parametrize("flavor", ["default", "sd3"])
def test_mmdit_forward_parity(flavor):
    ref_mod = load_reference("encoders.mmdit")
    depth = 2  # reference hardcodes hidden=32*depth, heads=depth (:557-558)
    sd3 = flavor == "sd3"
    kw = dict(qk_norm="rms", rmsnorm=True, swiglu=True,
              scale_mod_only=True, register_length=2) if sd3 else {}
    torch.manual_seed(0)
    ref = ref_mod.MMDiT(
        input_size=32, patch_size=2, in_channels=4, depth=depth,
        mlp_ratio=4.0, adm_in_channels=6, attn_mode="torch",
        encoder_depth=depth, z_dims=[32], projector_dim=48, **kw,
    )
    _perturb(ref, seed=1 + sd3)
    ref.eval()

    rs = np.random.RandomState(2)
    x = rs.randn(2, 4, 32, 32).astype(np.float32)
    t = (rs.rand(2) * 999).astype(np.float32)
    y = rs.randn(2, 6).astype(np.float32)
    ctx = rs.randn(2, 3, 768).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_zs = ref(torch.tensor(x), torch.tensor(t),
                              y=torch.tensor(y), context=torch.tensor(ctx))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
    ref_z = ref_zs[0].numpy()

    model = MMDiT(
        image_size=32, patch_size=2, in_channels=4,
        hidden_size=32 * depth, depth=depth, num_heads=depth,
        mlp_ratio=4.0, adm_in_channels=6, learn_align=True,
        encoder_depth=depth, z_dims=(32,), projector_dim=48,
        qk_norm="rms" if sd3 else None, use_rmsnorm=sd3, use_swiglu=sd3,
        scale_mod_only=sd3, register_length=2 if sd3 else 0,
    )
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.key(0)}, xn,
                           jnp.asarray(t), y=jnp.asarray(y),
                           context=jnp.asarray(ctx))
    params = convert_mmdit(state_dict_numpy(ref),
                           target_params=variables["params"])
    out, zs = model.apply({"params": params}, xn, jnp.asarray(t),
                          y=jnp.asarray(y), context=jnp.asarray(ctx))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL,
                               rtol=1e-3)
    # single-teacher tap returns a bare array (framework contract)
    np.testing.assert_allclose(np.asarray(zs), ref_z, atol=ATOL, rtol=1e-3)


def test_mmdit_align_training_step():
    """MM-DiT with --learn_align must train end-to-end: the zs tap feeds
    the align loss through the standard trainer contract."""
    from vaw_tpu.core import (
        GaussianDiffusion, ModelMeanType, get_named_beta_schedule,
        make_schedule,
    )
    from vaw_tpu.parallel import make_mesh
    from vaw_tpu.train import Trainer
    from vaw_tpu.utils.config import TrainConfig

    cfg = TrainConfig(model="MM-DiT-S", image_size=8, in_chans=4,
                      patch_size=2, num_classes=10, class_cond=True,
                      batch_size=4, weight_type="lambda",
                      mean_type="EPSILON", amp=False, learn_align=True,
                      encoder_depth=2, z_dims=16, gamma=0.5)
    model = MMDiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
                  depth=2, num_heads=2, num_classes=10,
                  class_dropout_prob=0.0, learn_align=True,
                  encoder_depth=2, z_dims=(16,), projector_dim=32)
    sched = make_schedule(get_named_beta_schedule("linear", 50))
    proc = GaussianDiffusion(schedule=sched,
                             model_mean_type=ModelMeanType.EPSILON,
                             weight_type=cfg.weight_type, learn_align=True,
                             gamma=0.5)
    trainer = Trainer(cfg, model, proc, make_mesh())
    batch = {
        "image": np.random.RandomState(0).randn(4, 8, 8, 4).astype(
            np.float32),
        "label": (np.arange(4) % 10).astype(np.int32),
        "features": np.random.RandomState(1).randn(4, 16, 16).astype(
            np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch)
    state, metrics = trainer.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "align" in metrics and np.isfinite(float(metrics["align"]))
