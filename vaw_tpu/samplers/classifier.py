"""Classifier loading for gradient guidance.

TPU equivalent of the reference `Classifier` wrapper
(reference: tools/sampler.py:51-80): derive the EncoderUNet hyperparameters
from the sampled UNet variant, load frozen weights from --use_classifier,
and expose classifier_fn(x, t) -> logits for
GaussianDiffusion.condition_mean/score via samplers.guidance.

Checkpoint formats accepted:
- an Orbax checkpoint directory holding the raw params pytree (the format
  save_classifier_checkpoint writes);
- a torch ``.pt``/``.pth`` EncoderUNetModel state_dict (guided-diffusion
  classifier releases), converted through models.convert.convert_encoder_unet.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_classifier", "save_classifier_checkpoint",
           "make_classifier_model"]


def make_classifier_model(cfg):
    """EncoderUNet with hyperparameters mirrored from the UNet variant being
    sampled, pool='attention' (reference: tools/sampler.py:58-73)."""
    from ..models.unet import EncoderUNetModel, UNet_models

    if cfg.model not in UNet_models:
        raise ValueError(
            f"--use_classifier derives the classifier from a UNet variant; "
            f"model {cfg.model!r} is not one of {sorted(UNet_models)} "
            "(the reference has the same constraint: tools/sampler.py:59-73 "
            "reads UNet attributes)"
        )
    unet = UNet_models[cfg.model](
        num_classes=cfg.num_classes, in_channels=cfg.in_chans,
        learn_sigma=cfg.learn_sigma, class_cond=cfg.class_cond,
    )
    num_head_channels = unet.num_head_channels
    if num_head_channels == -1:
        # attention pooling needs a head size; mirror the model's head count
        num_head_channels = unet.model_channels // max(unet.num_heads, 1)
    return EncoderUNetModel(
        image_size=unet.image_size,
        in_channels=cfg.in_chans,
        model_channels=unet.model_channels,
        out_channels=cfg.num_classes,
        num_res_blocks=unet.num_res_blocks,
        attention_resolutions=unet.attention_resolutions,
        channel_mult=unet.channel_mult,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=unet.use_scale_shift_norm,
        resblock_updown=unet.resblock_updown,
        pool="attention",
    )


def _abstract_params(model, cfg):
    """Abstract param tree (shapes/dtypes only) — jax.eval_shape traces
    init without executing the network, so startup does not pay a full
    classifier forward just to learn shapes."""
    dummy_x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_chans))
    dummy_t = jnp.zeros((1,))
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, dummy_x, dummy_t)
    )
    return variables["params"]


def save_classifier_checkpoint(path: str, params) -> None:
    """Write a raw classifier params pytree as an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), jax.device_get(params))


def build_classifier(cfg) -> Tuple[Callable, object]:
    """-> (classifier_fn(x, t) -> logits, EncoderUNetModel)."""
    model = make_classifier_model(cfg)
    path = cfg.use_classifier

    if path.endswith((".pt", ".pth")):
        import torch

        from ..models.convert import convert_encoder_unet

        sd = {
            k: v.detach().to(torch.float32).numpy()
            for k, v in torch.load(path, map_location="cpu").items()
        }
        params = convert_encoder_unet(
            sd, _abstract_params(model, cfg),
            num_heads=model.num_heads,
            num_head_channels=model.num_head_channels, pool="attention",
        )
    else:
        import orbax.checkpoint as ocp

        abstract = _abstract_params(model, cfg)  # already ShapeDtypeStructs
        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(os.path.abspath(path), abstract)

    def apply_fn(p, x, t):
        return model.apply({"params": p}, x, t)

    # Commit the weights to device ONCE: converted/restored trees are
    # host numpy, and as a per-batch jit argument they would otherwise pay
    # a fresh host->device copy of the full EncoderUNet every batch.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ClassifierFn(apply_fn, params), model


class ClassifierFn:
    """Classifier closure that ALSO exposes (apply_fn, params) so sampling
    jits can take the weights as an argument — closing over them would
    constant-fold the full EncoderUNet into every traced program
    (samplers/driver.py threads .params like the model params)."""

    def __init__(self, apply_fn: Callable, params):
        self.apply_fn = apply_fn
        self.params = params

    def __call__(self, x, t):
        return self.apply_fn(self.params, x, t)
