"""End-to-end slice: the full CLI driver (init -> jitted train loop ->
sample grid -> checkpoint) on the virtual CPU mesh with synthetic data.
This is the SURVEY.md section 7 'minimum end-to-end slice' exercised as a
test."""

import glob
import os

import numpy as np
import pytest

from vaw_tpu.cli.main import init, parse_args, train


@pytest.mark.slow
def test_cli_end_to_end_tiny(tmp_path):
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "0",
        "--class_cond", "False", "--batch_size", "8", "--total_steps", "3",
        "--sample_freq", "2", "--sample_steps", "4", "--diffusion_steps", "20",
        "--save_step", "3", "--eval", "False", "--amp", "False",
        "--solver", "ddim", "--logdir", str(tmp_path),
        "--weight_type", "lambda", "--sample_size", "4", "--num_samples", "4",
    ])
    ctx = init(cfg)
    state = train(cfg, ctx)
    assert int(state.step) == 3

    # Artifacts: config.yaml, sample grid at step 2, checkpoint at step 3.
    assert os.path.exists(os.path.join(cfg.logdir, "config.yaml"))
    assert glob.glob(os.path.join(cfg.logdir, "sample", "2.png"))
    ckpts = glob.glob(os.path.join(cfg.logdir, "checkpoint", "*"))
    assert ckpts, "checkpoint must be written at save_step"

    # Resume restores the step counter.
    from vaw_tpu.train import load_checkpoint

    restored = load_checkpoint(ckpts[0], state)
    assert int(restored.step) == 3


@pytest.mark.slow
def test_cli_edm_sampler_path(tmp_path):
    """EDM (heun) sampling path through the driver."""
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "0",
        "--class_cond", "False", "--batch_size", "8", "--total_steps", "1",
        "--sample_freq", "1", "--sample_steps", "4", "--diffusion_steps", "20",
        "--save_step", "0", "--eval", "False", "--amp", "False",
        "--solver", "heun", "--discretization", "edm", "--path_type", "linear",
        "--logdir", str(tmp_path), "--sample_size", "4", "--num_samples", "4",
    ])
    ctx = init(cfg)
    state = train(cfg, ctx)
    assert int(state.step) == 1
    assert glob.glob(os.path.join(cfg.logdir, "sample", "1.png"))


@pytest.mark.slow
def test_cli_mmdit_class_cond_end_to_end(tmp_path):
    """MM-DiT through the full CLI: class-conditional train step (dual
    stream, VectorEmbedder conditioning) + CFG sampling grid. Locks in the
    capability the reference leaves orphaned (its mmdit.py has no CLI
    wiring) but we expose as --model MM-DiT-{S,B,L}."""
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "MM-DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "10",
        "--class_cond", "True", "--batch_size", "8", "--total_steps", "2",
        "--sample_freq", "2", "--sample_steps", "4", "--diffusion_steps",
        "20", "--save_step", "2", "--eval", "False", "--amp", "False",
        "--solver", "ddim", "--logdir", str(tmp_path),
        "--weight_type", "lambda", "--sample_size", "4",
        "--num_samples", "4",
    ])
    ctx = init(cfg)
    state = train(cfg, ctx)
    assert int(state.step) == 2
    assert glob.glob(os.path.join(cfg.logdir, "sample", "2.png"))
    assert glob.glob(os.path.join(cfg.logdir, "checkpoint", "MM-DiT-S_*"))


@pytest.mark.slow
def test_cli_flow_matching_end_to_end(tmp_path):
    """Flow-matching mode through the full CLI: VECTOR-mean training and
    the ODE sampling grid (reference: main.py --model_mode flow wiring)."""
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "DiT-S", "--image_size", "8",
        "--patch_size", "4", "--in_chans", "3", "--num_classes", "0",
        "--class_cond", "False", "--batch_size", "8", "--total_steps", "2",
        "--sample_freq", "2", "--sample_steps", "4",
        "--model_mode", "flow", "--mean_type", "VECTOR",
        "--path_type", "linear", "--save_step", "0", "--eval", "False",
        "--amp", "False", "--logdir", str(tmp_path),
        "--sample_size", "4", "--num_samples", "4",
    ])
    ctx = init(cfg)
    state = train(cfg, ctx)
    assert int(state.step) == 2
    assert glob.glob(os.path.join(cfg.logdir, "sample", "2.png"))


@pytest.mark.slow
def test_cli_adm_unet_end_to_end(tmp_path):
    """ADM UNet through the full CLI at its native 32px: exercises the
    FiLM ResBlocks, attention levels, and the fused upsample phase-conv
    decoder path (ops/upsample_conv.py) inside the real train + DDIM
    sampling programs."""
    cfg = parse_args([
        "--dataset", "Gaussian", "--model", "ADM-32", "--image_size", "32",
        "--in_chans", "3", "--num_classes", "10", "--class_cond", "True",
        "--batch_size", "8", "--total_steps", "1", "--sample_freq", "1",
        "--sample_steps", "2", "--diffusion_steps", "20", "--save_step",
        "0", "--eval", "False", "--amp", "False", "--solver", "ddim",
        "--logdir", str(tmp_path), "--weight_type", "lambda",
        "--sample_size", "2", "--num_samples", "2",
    ])
    ctx = init(cfg)
    state = train(cfg, ctx)
    assert int(state.step) == 1
    assert glob.glob(os.path.join(cfg.logdir, "sample", "1.png"))
