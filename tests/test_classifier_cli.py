"""--use_classifier end-to-end: train a tiny UNet via the CLI, save a
random-init classifier checkpoint, and sample with classifier gradient
guidance through sample.py (reference: tools/sampler.py:51-89, main.py:350).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.models.unet import UNet_models, create_unet_model
from vaw_tpu.samplers.classifier import (
    build_classifier,
    make_classifier_model,
    save_classifier_checkpoint,
)
from vaw_tpu.utils.config import TrainConfig


def _tiny_unet_factory(num_classes=3, in_channels=3, dropout=0,
                       learn_sigma=False, class_cond=True,
                       drop_label_prob=0.0, **kwargs):
    return create_unet_model(
        image_size=8, num_channels=16, num_res_blocks=1,
        attention_resolutions="4", num_head_channels=8,
        channel_mult="1,2", num_classes=num_classes, dropout=dropout,
        in_channels=in_channels, drop_label_prob=drop_label_prob,
        learn_sigma=learn_sigma, class_cond=class_cond, **kwargs)


@pytest.fixture()
def tiny_unet_registry(monkeypatch):
    monkeypatch.setitem(UNet_models, "UNet-32", _tiny_unet_factory)
    return "UNet-32"


def _cfg(model, ckpt_path):
    return TrainConfig(
        model=model, image_size=8, in_chans=3, num_classes=3,
        class_cond=True, use_classifier=ckpt_path, guidance_scale=2.0,
    )


def test_build_classifier_requires_unet():
    cfg = _cfg("DiT-S", "/nonexistent")
    with pytest.raises(ValueError, match="UNet variant"):
        build_classifier(cfg)


@pytest.mark.slow
def test_build_classifier_orbax_roundtrip(tmp_path, tiny_unet_registry):
    ckpt = str(tmp_path / "clf_ckpt")
    cfg = _cfg(tiny_unet_registry, ckpt)
    model = make_classifier_model(cfg)
    params = model.init({"params": jax.random.key(1)},
                        jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)))["params"]
    save_classifier_checkpoint(ckpt, params)

    classifier_fn, _ = build_classifier(cfg)
    logits = classifier_fn(jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,)))
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_build_classifier_bad_path_is_hard_error(tiny_unet_registry):
    cfg = _cfg(tiny_unet_registry, "/nonexistent/clf")
    with pytest.raises(Exception):
        build_classifier(cfg)


@pytest.mark.slow
def test_sample_cli_with_classifier_guidance(tmp_path, tiny_unet_registry):
    from vaw_tpu.cli.main import init, parse_args, train
    from vaw_tpu.cli.sample import main as sample_main

    logdir = str(tmp_path / "train")
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", tiny_unet_registry,
        "--image_size", "8", "--in_chans", "3", "--num_classes", "3",
        "--class_cond", "True", "--batch_size", "8", "--total_steps", "2",
        "--sample_freq", "0", "--sample_steps", "2",
        "--diffusion_steps", "20", "--save_step", "2", "--eval", "False",
        "--amp", "False", "--solver", "ddim", "--logdir", logdir,
        "--num_samples", "2", "--sample_size", "2",
    ])
    ctx = init(cfg)
    train(cfg, ctx)
    ckpts = glob.glob(os.path.join(cfg.logdir, "checkpoint", "*"))
    assert ckpts, "training did not save a checkpoint"

    clf_ckpt = str(tmp_path / "clf_ckpt")
    clf_model = make_classifier_model(cfg)
    clf_params = clf_model.init(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1,)))["params"]
    save_classifier_checkpoint(clf_ckpt, clf_params)

    save_path = str(tmp_path / "out")
    sample_main([
        "--model", tiny_unet_registry, "--image_size", "8",
        "--in_chans", "3", "--num_classes", "3", "--class_cond", "True",
        "--sample_steps", "2", "--diffusion_steps", "20",
        "--solver", "ddim", "--num_samples", "2", "--sample_size", "2",
        "--resume", ckpts[0], "--save_path", save_path,
        "--use_classifier", clf_ckpt, "--guidance_scale", "2.0",
    ])
    pngs = glob.glob(os.path.join(save_path, "*", "*.png"))
    assert len(pngs) == 2, "guided sampling did not write per-class PNGs"
