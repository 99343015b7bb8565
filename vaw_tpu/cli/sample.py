"""Inference-only entry point, flag-compatible with the reference sample.py
(reference: sample.py:20-186): load an EMA checkpoint, generate N samples,
write PNGs (per-class subdirectories when conditional)."""

from __future__ import annotations

import argparse
import os

import jax

# See cli/main.py: in-process backend pin (env JAX_PLATFORMS can be
# pre-empted by site plugins registering an accelerator backend).
if os.environ.get("VAW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VAW_PLATFORM"])

import numpy as np

from ..models import build_model
from ..parallel import make_mesh
from ..samplers import Sampler
from ..train import Trainer, load_checkpoint
from ..utils import add_sample_args, config_from_args
from .main import build_diffusion


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Sample from a checkpoint")
    add_sample_args(parser)
    return config_from_args(parser.parse_args(argv))


def main(argv=None):
    from ..utils.cache import enable_compilation_cache
    from ..parallel.distributed import is_main_process, setup_distributed

    enable_compilation_cache()
    setup_distributed()  # no-op single-process (reference: sample.py:122-124)
    cfg = parse_args(argv)
    assert cfg.resume, "--resume checkpoint path is required"
    mesh = make_mesh(data_axis=cfg.data_axis, model_axis=cfg.model_axis)

    sample_diffusion = build_diffusion(cfg, use_ddim=True)
    train_diffusion = build_diffusion(cfg, use_ddim=False)
    model = build_model(cfg)
    trainer = Trainer(cfg, model, train_diffusion, mesh)

    dummy = {
        "image": np.zeros(
            (2, cfg.image_size, cfg.image_size,
             cfg.in_chans * (2 if cfg.in_chans == 4 else 1)), np.float32,
        ),
    }
    if cfg.class_cond:
        dummy["label"] = np.zeros((2,), np.int32)
    state = trainer.init_state(jax.random.key(cfg.seed), dummy)
    state = load_checkpoint(cfg.resume, state)
    print(f"==> Loaded {cfg.resume} (step {int(state.step)})")

    vae_decode_fn = None
    if cfg.in_chans == 4:
        try:
            from ..data.vae import load_vae_decoder

            vae_decode_fn = load_vae_decoder(
                cfg.vae, dtype=cfg.compute_dtype)
        except Exception as e:  # noqa: BLE001
            print(f"[vae] decoder unavailable ({e})")

    classifier_fn = None
    if cfg.use_classifier:
        from ..samplers.classifier import build_classifier

        classifier_fn, _ = build_classifier(cfg)
        print(f"==> Classifier guidance from {cfg.use_classifier}")

    def model_fn(params, x, t, **kw):
        return model.apply({"params": params}, x, t, train=False, **kw)

    sampler = Sampler(cfg, model_fn, diffusion=sample_diffusion,
                      vae_decode_fn=vae_decode_fn,
                      classifier_fn=classifier_fn, params=state.ema_params)
    samples, labels = sampler.sample(
        jax.random.key(cfg.seed), cfg.num_samples, cfg.sample_size,
        cfg.image_size, cfg.num_classes, progress_bar=True,
    )

    # PNG dump on the main process only, per-class subdirs when conditional
    # (reference: sample.py:155-182, rank-0 gated).
    if not is_main_process():
        return
    from PIL import Image

    os.makedirs(cfg.save_path, exist_ok=True)
    for i, img in enumerate(samples):
        if cfg.class_cond and labels is not None:
            sub = os.path.join(cfg.save_path, str(int(labels[i])))
            os.makedirs(sub, exist_ok=True)
            path = os.path.join(sub, f"{i:06d}.png")
        else:
            path = os.path.join(cfg.save_path, f"{i:06d}.png")
        arr = img[..., 0] if img.shape[-1] == 1 else img
        Image.fromarray(arr).save(path)
    print(f"Saved {len(samples)} samples to {cfg.save_path}")


if __name__ == "__main__":
    main()
