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
