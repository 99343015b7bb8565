"""Sampler driver API tests: all three sampler kinds through the public
sample() surface with a tiny trained-ish model, label handling, VAE hook,
uint8 output contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.cli.main import build_diffusion
from vaw_tpu.samplers import Sampler
from vaw_tpu.utils.config import TrainConfig


def _model_fn(x, t, y=None, **kw):
    # deterministic pseudo-eps model
    return -0.1 * x


@pytest.mark.parametrize("mode_solver", [
    ("diffusion", "ddim"), ("diffusion", "heun"), ("flow", "euler"),
])
def test_sampler_kinds_produce_uint8(mode_solver):
    mode, solver = mode_solver
    cfg = TrainConfig(
        model_mode=mode, solver=solver, sample_steps=4, diffusion_steps=8,
        image_size=8, in_chans=3, num_classes=0, class_cond=False,
        mean_type="EPSILON" if mode == "diffusion" else "VECTOR",
        path_type="cosine" if mode == "diffusion" else "linear",
        sampler_type="sde",
    )
    diffusion = build_diffusion(cfg, use_ddim=(solver == "ddim")) \
        if mode == "diffusion" else build_diffusion(cfg)
    sampler = Sampler(cfg, _model_fn, diffusion=diffusion)
    samples, labels = sampler.sample(
        jax.random.key(0), num_samples=6, sample_size=4, image_size=8,
        num_classes=0,
    )
    assert samples.shape == (6, 8, 8, 3)
    assert samples.dtype == np.uint8
    assert labels is None


def test_sampler_class_conditional_labels():
    cfg = TrainConfig(
        model_mode="diffusion", solver="ddim", sample_steps=4,
        diffusion_steps=8, image_size=8, in_chans=3, num_classes=5,
        class_cond=True, class_labels=[2, 4], path_type="cosine",
    )
    diffusion = build_diffusion(cfg, use_ddim=True)
    sampler = Sampler(cfg, _model_fn, diffusion=diffusion)
    samples, labels = sampler.sample(
        jax.random.key(0), num_samples=8, sample_size=4, image_size=8,
        num_classes=5,
    )
    assert labels.shape == (8,)
    assert set(np.asarray(labels)).issubset({2, 4})


def test_sampler_vae_decode_hook():
    cfg = TrainConfig(
        model_mode="diffusion", solver="ddim", sample_steps=4,
        diffusion_steps=8, image_size=4, in_chans=4, num_classes=0,
        class_cond=False, latent_scale=0.5, path_type="cosine",
    )
    seen = {}

    def fake_decode(z):
        seen["z"] = z
        n = z.shape[0]
        return jnp.zeros((n, 8, 8, 3))

    diffusion = build_diffusion(cfg, use_ddim=True)
    sampler = Sampler(cfg, _model_fn, diffusion=diffusion,
                      vae_decode_fn=fake_decode)
    samples, _ = sampler.sample(
        jax.random.key(0), num_samples=2, sample_size=2, image_size=4,
        num_classes=0,
    )
    # Decoded pixel resolution, not latent resolution.
    assert samples.shape == (2, 8, 8, 3)
    # uint8 of zeros -> 127 ((0+1)*127.5 clipped)
    assert int(samples.max()) in (127, 128)


def test_params_argument_matches_closure_path():
    """Sampler(params=...) threads weights through the jit as arguments
    (remote/AOT-compile safe); it must generate exactly what the legacy
    closure construction generates."""
    import jax
    import numpy as np

    from vaw_tpu.core import (
        GaussianDiffusion, get_named_beta_schedule, make_schedule,
    )
    from vaw_tpu.models.dit import DiT
    from vaw_tpu.samplers.driver import Sampler
    from vaw_tpu.utils.config import TrainConfig

    cfg = TrainConfig(model="DiT-S", image_size=8, in_chans=3, patch_size=4,
                      num_classes=0, class_cond=False, solver="ddim",
                      sample_steps=4, diffusion_steps=20)
    model = DiT(image_size=8, patch_size=4, in_channels=3, hidden_size=32,
                depth=1, num_heads=2, num_classes=0, class_dropout_prob=0.0)
    import jax.numpy as jnp

    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)))
    sched = make_schedule(get_named_beta_schedule("linear", 20))
    diffusion = GaussianDiffusion(schedule=sched)

    def closure_fn(x, t, **kw):
        out, _ = model.apply(variables, x, t, **kw)
        return out

    def param_fn(p, x, t, **kw):
        out, _ = model.apply(p, x, t, **kw)
        return out

    a, _ = Sampler(cfg, closure_fn, diffusion=diffusion).sample(
        jax.random.key(1), 4, 4, 8, 0)
    b, _ = Sampler(cfg, param_fn, diffusion=diffusion,
                   params=variables).sample(jax.random.key(1), 4, 4, 8, 0)
    np.testing.assert_array_equal(a, b)
