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
